import jax.numpy as jnp
import numpy as np

from vorta_tpu.ops.rope import apply_rope, rope_axis_split, rope_cos_sin, video_rope_angles


def test_axis_split_128():
    # head_dim 128 -> (22, 21, 21) complex slots (reference modeling_wan.py:249-256)
    assert rope_axis_split(128) == (22, 21, 21)
    assert sum(rope_axis_split(128)) == 64


def test_angles_shape_and_broadcast():
    angles = video_rope_angles((2, 3, 4), 12)
    assert angles.shape == (24, 6)
    ct, ch, cw = rope_axis_split(12)
    # token (t=1, h=0, w=0): t-angles at pos 1, h/w-angles at pos 0
    tok = angles.reshape(2, 3, 4, 6)
    np.testing.assert_allclose(tok[1, 0, 0, :ct], video_rope_angles((2, 1, 1), 12)[1, :ct])
    np.testing.assert_array_equal(tok[0, 0, 0], np.zeros(6))


def test_apply_rope_matches_complex_oracle():
    latent, d = (2, 2, 2), 12
    s = 8
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 2, s, d)).astype(np.float32)
    angles = video_rope_angles(latent, d)
    cos, sin = rope_cos_sin(latent, d)
    out = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(cos), jnp.asarray(sin)))

    # oracle: complex multiply on interleaved pairs in float64
    xc = x.astype(np.float64).reshape(1, 2, s, d // 2, 2)
    xc = xc[..., 0] + 1j * xc[..., 1]
    rot = xc * np.exp(1j * angles)
    ref = np.stack([rot.real, rot.imag], axis=-1).reshape(1, 2, s, d)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_apply_rope_preserves_norm():
    latent, d = (2, 3, 4), 12
    cos, sin = rope_cos_sin(latent, d)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 1, 24, d)).astype(np.float32))
    y = apply_rope(x, jnp.asarray(cos), jnp.asarray(sin))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )


def test_apply_rope_half_equals_interleaved_after_perm():
    from vorta_tpu.ops.rope import apply_rope_half, half_perm, permute_qk_to_half

    rng = np.random.default_rng(3)
    latent, d = (2, 3, 4), 16
    x = rng.normal(size=(2, 3, 24, d)).astype(np.float32)
    cos, sin = rope_cos_sin(latent, d)
    want = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(cos), jnp.asarray(sin)))
    p = half_perm(d)
    got = np.asarray(
        apply_rope_half(jnp.asarray(x[..., p]), jnp.asarray(cos), jnp.asarray(sin))
    )
    np.testing.assert_allclose(got, want[..., p], rtol=1e-6, atol=1e-6)


def test_permute_qk_to_half_blocks_and_dot_invariance():
    from vorta_tpu.ops.rope import half_perm, permute_qk_to_half

    rng = np.random.default_rng(4)
    d, heads = 8, 3
    w = rng.normal(size=(5, heads * d)).astype(np.float32)
    pw = permute_qk_to_half(w, d, axis=-1)
    p = half_perm(d)
    for h in range(heads):
        np.testing.assert_array_equal(pw[:, h * d : (h + 1) * d], w[:, h * d + p])
    # q . k over the channel dim is invariant under the shared permutation
    q = rng.normal(size=(heads * d,)).astype(np.float32)
    k = rng.normal(size=(heads * d,)).astype(np.float32)
    qp = permute_qk_to_half(q, d)
    kp = permute_qk_to_half(k, d)
    np.testing.assert_allclose(qp @ kp, q @ k, rtol=1e-6)
