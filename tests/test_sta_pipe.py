"""Grid-pipelined STA kernel (ops/sta_pipe) vs the dense oracle and v5."""

import numpy as np
import jax.numpy as jnp
import pytest

from vorta_tpu.ops.sta_pipe import sta_pipe_attention, supports_pipe
from vorta_tpu.ops.sta_row import sta_row_attention

from test_sta_window import dense_sta_oracle


@pytest.mark.parametrize("latent,tile", [
    ((4, 6, 16), (2, 3, 8)),   # clamped everywhere (win >= grid on t/h)
    ((8, 6, 32), (2, 3, 8)),   # real clamping on t and w
])
def test_matches_dense_oracle(latent, tile):
    b, h, d = 1, 2, 32
    s = int(np.prod(latent))
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    out = sta_pipe_attention(
        q, k, v, jnp.ones((h,), jnp.int32),
        latent_shape=latent, tile=tile, window=(3, 3, 3), interpret=True,
    )
    ref = dense_sta_oracle(q, k, v, latent, tile, (3, 3, 3))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_matches_v5_kernel_and_inactive_heads():
    latent, tile = (8, 6, 32), (2, 3, 8)
    b, h, d = 1, 2, 32
    s = int(np.prod(latent))
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    active = jnp.asarray([1, 0], jnp.int32)
    out = sta_pipe_attention(q, k, v, active, latent_shape=latent, tile=tile,
                             window=(3, 3, 3), interpret=True)
    ref = sta_row_attention(q, k, v, active, latent_shape=latent, tile=tile,
                            window=(3, 3, 3), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    assert np.abs(np.asarray(out)[:, 1]).max() == 0  # inactive head zeroed


def test_joint_text_tail_matches_v5():
    latent, tile = (4, 6, 16), (2, 3, 8)
    b, h, d, lt, eff = 1, 2, 32, 16, 11
    s = int(np.prod(latent))
    rng = np.random.default_rng(2)
    mk = lambda shape: jnp.asarray(rng.standard_normal(shape), jnp.float32)
    q, k, v = mk((b, h, s, d)), mk((b, h, s, d)), mk((b, h, s, d))
    tk, tv = mk((b, h, lt, d)), mk((b, h, lt, d))
    bias = jnp.where(jnp.arange(lt) < eff, 0.0, -1e30).astype(jnp.float32)
    kw = dict(latent_shape=latent, tile=tile, window=(3, 3, 3),
              text_k=tk, text_v=tv, text_bias=bias, interpret=True)
    active = jnp.ones((h,), jnp.int32)
    out = sta_pipe_attention(q, k, v, active, **kw)
    ref = sta_row_attention(q, k, v, active, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_supports():
    assert supports_pipe((20, 45, 80), (5, 9, 8), 128)
    assert supports_pipe((30, 45, 80), (6, 9, 8), 128, text_len=256)
    assert supports_pipe((20, 30, 52), (4, 6, 4), 128)  # tw % 8 -> masked-w
    assert not supports_pipe((20, 45, 80), (3, 9, 8), 128)  # 3 !| 20


@pytest.mark.parametrize("latent,tile", [
    ((4, 6, 12), (2, 3, 4)),   # tw | 8 -> grouped-width variant
    ((8, 6, 20), (2, 3, 4)),   # grouped, real clamping on t and w
    ((8, 6, 20), (2, 3, 2)),   # grouped, tw=2 (4 tiles per group)
    ((4, 6, 18), (2, 3, 6)),   # tw=6: genuinely misaligned -> masked-width
    ((8, 6, 30), (2, 3, 6)),   # masked-width, real clamping
])
def test_masked_width_matches_dense_oracle(latent, tile):
    b, h, d = 1, 2, 32
    s = int(np.prod(latent))
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    out = sta_pipe_attention(
        q, k, v, jnp.asarray([1, 0], jnp.int32),
        latent_shape=latent, tile=tile, window=(3, 3, 3), interpret=True,
    )
    ref = dense_sta_oracle(q, k, v, latent, tile, (3, 3, 3))
    np.testing.assert_allclose(np.asarray(out)[:, :1], ref[:, :1],
                               rtol=2e-4, atol=2e-4)
    assert np.abs(np.asarray(out)[:, 1]).max() == 0  # inactive head zeroed


def test_masked_width_text_tail():
    latent, tile = (4, 6, 12), (2, 3, 4)
    b, h, d, lt, eff = 1, 2, 32, 16, 11
    s = int(np.prod(latent))
    rng = np.random.default_rng(6)
    mk = lambda shape: jnp.asarray(rng.standard_normal(shape), jnp.float32)
    q, k, v = mk((b, h, s, d)), mk((b, h, s, d)), mk((b, h, s, d))
    tk, tv = mk((b, h, lt, d)), mk((b, h, lt, d))
    bias = jnp.where(jnp.arange(lt) < eff, 0.0, -1e30).astype(jnp.float32)
    kw = dict(latent_shape=latent, tile=tile, window=(3, 3, 3),
              text_k=tk, text_v=tv, text_bias=bias, interpret=True)
    active = jnp.ones((h,), jnp.int32)
    out = sta_pipe_attention(q, k, v, active, **kw)
    # oracle: dense attention over [window video kv | valid text kv]
    from vorta_tpu.geometry import sta_tile_mask

    tmask = np.asarray(sta_tile_mask(latent, (3, 3, 3), tile))
    tpt = int(np.prod(tile))
    n_tiles = s // tpt
    vis = np.repeat(np.repeat(tmask, tpt, 0), tpt, 1)
    # kernel layout is raster, oracle mask is tile-layout: remap
    from vorta_tpu.ops.layout import tile_sequence, untile_sequence

    qt = tile_sequence(q, latent, tile)
    kt_ = tile_sequence(k, latent, tile)
    vt_ = tile_sequence(v, latent, tile)
    logits = np.einsum("bhqd,bhkd->bhqk", np.asarray(qt), np.asarray(kt_))
    logits = logits * (d ** -0.5)
    logits = np.where(vis[None, None], logits, -1e30)
    tl = np.einsum("bhqd,bhkd->bhqk", np.asarray(qt), np.asarray(tk)) * (d ** -0.5)
    tl = tl + np.asarray(bias)[None, None, None, :]
    full = np.concatenate([logits, tl], axis=-1)
    p = np.exp(full - full.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    allv = np.concatenate([np.asarray(vt_), np.asarray(tv)], axis=2)
    ref_t = np.einsum("bhqk,bhkd->bhqd", p, allv)
    ref = np.asarray(untile_sequence(jnp.asarray(ref_t), latent, tile))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_stable_softmax_matches_fast():
    latent, tile = (8, 6, 32), (2, 3, 8)
    b, h, d = 1, 2, 32
    s = int(np.prod(latent))
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    kw = dict(latent_shape=latent, tile=tile, window=(3, 3, 3), interpret=True)
    active = jnp.ones((h,), jnp.int32)
    fast = sta_pipe_attention(q, k, v, active, softmax="fast", **kw)
    stab = sta_pipe_attention(q, k, v, active, softmax="stable", **kw)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(stab),
                               rtol=2e-4, atol=2e-4)


def test_sT_variant_matches_full():
    latent, tile = (8, 6, 32), (2, 3, 8)
    b, h, d = 1, 2, 32
    s = int(np.prod(latent))
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    kw = dict(latent_shape=latent, tile=tile, window=(3, 3, 3), interpret=True)
    active = jnp.ones((h,), jnp.int32)
    a = sta_pipe_attention(q, k, v, active, variant="sT", **kw)
    b_ = sta_pipe_attention(q, k, v, active, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4)


def test_w_groups_cover_all_windows():
    """Property: every group's KV slice covers the union of its tiles'
    clamped w windows, within the padded width, for many geometries."""
    from vorta_tpu.ops.sta_pipe import _w_groups
    from vorta_tpu.ops.sta_row import _w_window_starts

    for w_tiles in range(2, 14):
        for tw in (2, 4):
            for win_w in (1, 2, 3, 5):
                w = w_tiles * tw
                latent = (4, 6, w)
                tile = (2, 3, tw)
                window = (3, 3, win_w)
                w_pad, n_groups, bw8, los = _w_groups(latent, tile, window)
                assert w_pad % 8 == 0 and n_groups == w_pad // 8
                starts = _w_window_starts(latent, tile, window)
                bw_tok = min(win_w, w_tiles) * tw
                for gi in range(n_groups):
                    assert 0 <= los[gi] <= w_pad - bw8
                    for qw in range(gi * 8, min((gi + 1) * 8, w)):
                        ws = starts[qw // tw]
                        assert los[gi] <= ws
                        assert ws + bw_tok <= los[gi] + bw8, (
                            latent, tile, window, gi, qw)
