import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vorta_tpu.config import AttentionConfig
from vorta_tpu.geometry import expand_tile_mask, sta_tile_mask
from vorta_tpu.ops.attention_ref import attention_dense
from vorta_tpu.ops.coreset import pool_by_similarity, unpool_by_similarity
from vorta_tpu.ops.experts import FULL, LOWRES, STA, lowres_groups_for
from vorta_tpu.ops.joint_experts import (
    JointConfig,
    joint_full_attention,
    joint_lowres_attention,
    joint_sta_attention,
    routed_joint_attention,
)
from vorta_tpu.ops.layout import tile_sequence, untile_sequence

VIDEO = AttentionConfig(
    latent_shape=(4, 4, 8),
    sta_window=(3, 3, 3),
    sta_tile=(2, 2, 2),
    lowres_window=(2, 2, 2),
    block_q=32,
    block_kv=32,
)
L = 24  # padded text length
JCFG = JointConfig(video=VIDEO, text_len=L)
SV = VIDEO.seq_len


def rand_inputs(key, b=2, h=2, d=8, eff_text=17):
    ks = jax.random.split(key, 6)
    qv, kv_, vv = (jax.random.normal(ks[i], (b, h, SV, d)) for i in range(3))
    qt, kt, vt = (jax.random.normal(ks[3 + i], (b, h, L, d)) for i in range(3))
    mask = jnp.arange(L) < eff_text
    return qv, kv_, vv, qt, kt, vt, jnp.broadcast_to(mask[None], (b, L))


def dense_joint_oracle(qv, kv_, vv, qt, kt, vt, eff_text, extra_mask=None):
    """Attention over [video | valid text], outputs split back."""
    q = jnp.concatenate([qv, qt[:, :, :eff_text]], axis=2)
    k = jnp.concatenate([kv_, kt[:, :, :eff_text]], axis=2)
    v = jnp.concatenate([vv, vt[:, :, :eff_text]], axis=2)
    out = attention_dense(q, k, v, mask=extra_mask)
    video = out[:, :, :SV]
    text = jnp.pad(out[:, :, SV:], ((0, 0), (0, 0), (0, L - eff_text), (0, 0)))
    return video, text


def test_joint_full_matches_oracle():
    eff = 17
    qv, kv_, vv, qt, kt, vt, mask = rand_inputs(jax.random.PRNGKey(0), eff_text=eff)
    video, text = joint_full_attention(qv, kv_, vv, qt, kt, vt, mask, JCFG, interpret=True)
    ref_v, ref_t = dense_joint_oracle(qv, kv_, vv, qt, kt, vt, eff)
    np.testing.assert_allclose(np.asarray(video), np.asarray(ref_v), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(text[:, :, :eff]), np.asarray(ref_t[:, :, :eff]), rtol=3e-5, atol=3e-5
    )


def test_joint_lowres_matches_manual():
    eff = 17
    qv, kv_, vv, qt, kt, vt, mask = rand_inputs(jax.random.PRNGKey(1), eff_text=eff)
    video, text = joint_lowres_attention(qv, kv_, vv, qt, kt, vt, mask, JCFG, interpret=True)

    groups = lowres_groups_for(VIDEO)
    pq, qm = pool_by_similarity(qv, groups)
    pk, km = pool_by_similarity(kv_, groups)
    pv, _ = pool_by_similarity(vv, groups, km)
    q = jnp.concatenate([pq, qt[:, :, :eff]], axis=2)
    k = jnp.concatenate([pk, kt[:, :, :eff]], axis=2)
    v = jnp.concatenate([pv, vt[:, :, :eff]], axis=2)
    out = attention_dense(q, k, v)
    p = groups.pooled_length
    ref_v = unpool_by_similarity(out[:, :, :p], groups, qm)
    np.testing.assert_allclose(np.asarray(video), np.asarray(ref_v), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(text[:, :, :eff]), np.asarray(out[:, :, p:]), rtol=3e-5, atol=3e-5
    )


def test_joint_sta_matches_masked_oracle():
    eff = 17
    qv, kv_, vv, qt, kt, vt, mask = rand_inputs(jax.random.PRNGKey(2), eff_text=eff)
    video, text = joint_sta_attention(qv, kv_, vv, qt, kt, vt, mask, JCFG, interpret=True)

    # oracle in tiled layout: window mask for video-video, dense elsewhere
    tile_mask = sta_tile_mask(VIDEO.latent_shape, VIDEO.sta_window, VIDEO.sta_tile)
    em = expand_tile_mask(tile_mask, VIDEO.tokens_per_tile, 1, 1)  # token granular
    n = SV + eff
    full_mask = np.ones((n, n), bool)
    full_mask[:SV, :SV] = em
    shape, tile = VIDEO.latent_shape, VIDEO.sta_tile
    tq = jnp.concatenate([tile_sequence(qv, shape, tile), qt[:, :, :eff]], axis=2)
    tk = jnp.concatenate([tile_sequence(kv_, shape, tile), kt[:, :, :eff]], axis=2)
    tv = jnp.concatenate([tile_sequence(vv, shape, tile), vt[:, :, :eff]], axis=2)
    out = attention_dense(tq, tk, tv, mask=jnp.asarray(full_mask)[None, None])
    ref_v = untile_sequence(out[:, :, :SV], shape, tile)
    np.testing.assert_allclose(np.asarray(video), np.asarray(ref_v), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(text[:, :, :eff]), np.asarray(out[:, :, SV:]), rtol=3e-5, atol=3e-5
    )


def test_routed_joint_soft_onehot_equals_expert():
    qv, kv_, vv, qt, kt, vt, mask = rand_inputs(jax.random.PRNGKey(3))
    b, h = qv.shape[:2]
    scores = jnp.zeros((b, h, 3)).at[:, :, STA].set(1.0)
    video, text = routed_joint_attention(
        qv, kv_, vv, qt, kt, vt, scores, mask, JCFG, mode="soft", interpret=True
    )
    ref_v, ref_t = joint_sta_attention(qv, kv_, vv, qt, kt, vt, mask, JCFG, interpret=True)
    np.testing.assert_allclose(np.asarray(video), np.asarray(ref_v), rtol=3e-5, atol=3e-5)
    ref_t = ref_t * mask[0][None, None, :, None].astype(ref_t.dtype)
    np.testing.assert_allclose(np.asarray(text), np.asarray(ref_t), rtol=3e-5, atol=3e-5)


def test_routed_joint_hard_mixed_heads():
    qv, kv_, vv, qt, kt, vt, mask = rand_inputs(jax.random.PRNGKey(4))
    b, h = qv.shape[:2]
    scores = jnp.broadcast_to(
        jnp.asarray([[0.9, 0.05, 0.05], [0.05, 0.05, 0.9]])[None], (b, h, 3)
    )
    video, text = routed_joint_attention(
        qv, kv_, vv, qt, kt, vt, scores, mask, JCFG, mode="hard", interpret=True
    )
    fv, ft = joint_full_attention(qv, kv_, vv, qt, kt, vt, mask, JCFG, interpret=True)
    sv, st = joint_sta_attention(qv, kv_, vv, qt, kt, vt, mask, JCFG, interpret=True)
    np.testing.assert_allclose(np.asarray(video[:, 0]), np.asarray(fv[:, 0]), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(video[:, 1]), np.asarray(sv[:, 1]), rtol=3e-5, atol=3e-5)
    # padded text rows zeroed
    assert np.all(np.asarray(text[:, :, 17:]) == 0)


def test_routed_joint_soft_grads():
    qv, kv_, vv, qt, kt, vt, mask = rand_inputs(jax.random.PRNGKey(5), b=1, h=1)
    scores = jnp.full((1, 1, 3), 1 / 3)

    def loss(s, qv):
        video, text = routed_joint_attention(
            qv, kv_, vv, qt, kt, vt, s, mask, JCFG, mode="soft", interpret=True
        )
        return jnp.sum(video.astype(jnp.float32) ** 2) + jnp.sum(text.astype(jnp.float32) ** 2)

    gs, gq = jax.grad(loss, argnums=(0, 1))(scores, qv)
    assert np.all(np.isfinite(np.asarray(gs))) and np.any(np.asarray(gs) != 0)
    assert np.all(np.isfinite(np.asarray(gq))) and np.any(np.asarray(gq) != 0)


def test_routed_joint_hard_perhead_switch_path():
    """Window-dense-eligible geometry (tokens/tile >= 192) takes the
    per-head lax.switch dispatch; per-head outputs must equal the experts."""
    from vorta_tpu.ops.sta_window import prefer_window_dense

    video_cfg = AttentionConfig(
        latent_shape=(4, 6, 16),
        sta_window=(3, 3, 3),
        sta_tile=(4, 6, 8),
        lowres_window=(2, 2, 2),
        block_q=32,
        block_kv=32,
    )
    assert prefer_window_dense(video_cfg.latent_shape, video_cfg.sta_tile)
    jcfg = JointConfig(video=video_cfg, text_len=L)
    sv_len = video_cfg.seq_len
    b, h, d, eff = 1, 3, 8, 17
    ks = jax.random.split(jax.random.PRNGKey(7), 6)
    qv, kv_, vv = (jax.random.normal(ks[i], (b, h, sv_len, d)) for i in range(3))
    qt, kt, vt = (jax.random.normal(ks[3 + i], (b, h, L, d)) for i in range(3))
    mask = jnp.broadcast_to((jnp.arange(L) < eff)[None], (b, L))
    # head 0 -> full, head 1 -> lowres, head 2 -> STA
    scores = jnp.asarray(
        [[[0.9, 0.05, 0.05], [0.05, 0.9, 0.05], [0.05, 0.05, 0.9]]]
    )
    video, text = routed_joint_attention(
        qv, kv_, vv, qt, kt, vt, scores, mask, jcfg, mode="hard", interpret=True
    )
    fv, ft = joint_full_attention(qv, kv_, vv, qt, kt, vt, mask, jcfg, interpret=True)
    lv, lt = joint_lowres_attention(qv, kv_, vv, qt, kt, vt, mask, jcfg, interpret=True)
    sv, st = joint_sta_attention(qv, kv_, vv, qt, kt, vt, mask, jcfg, interpret=True)
    np.testing.assert_allclose(np.asarray(video[:, 0]), np.asarray(fv[:, 0]), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(video[:, 1]), np.asarray(lv[:, 1]), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(video[:, 2]), np.asarray(sv[:, 2]), rtol=3e-5, atol=3e-5)
    assert np.all(np.asarray(text[:, :, eff:]) == 0)


def test_joint_qk_int8_close_to_bf16():
    """Serving-mode int8 QK^T (video.qk_int8) on the joint full + lowres
    experts stays within quantization noise; STA heads are untouched."""
    import dataclasses

    qv, kv_, vv, qt, kt, vt, mask = rand_inputs(jax.random.PRNGKey(31))
    jcfg8 = JointConfig(video=dataclasses.replace(VIDEO, qk_int8=True),
                        text_len=L)
    scores = jnp.zeros((qv.shape[0], qv.shape[1], 3), jnp.float32)
    scores = scores.at[:, 0, FULL].set(1.0).at[:, 1, LOWRES].set(1.0)
    v_ref, t_ref = routed_joint_attention(
        qv, kv_, vv, qt, kt, vt, scores, mask, JCFG, mode="hard",
        interpret=True)
    v8, t8 = routed_joint_attention(
        qv, kv_, vv, qt, kt, vt, scores, mask, jcfg8, mode="hard",
        interpret=True)
    for ref, out in ((v_ref, v8), (t_ref, t8)):
        ref = np.asarray(ref, np.float32)
        out = np.asarray(out, np.float32)
        rel = np.abs(out - ref).mean() / max(np.abs(ref).mean(), 1e-6)
        assert rel < 0.05, rel
