"""Window-dense STA kernel (ops/sta_window.py) vs the tiled-layout oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vorta_tpu.config import AttentionConfig
from vorta_tpu.geometry import sta_tile_mask
from vorta_tpu.ops.experts import sta_attention
from vorta_tpu.ops.sta_window import (
    sta_window_attention,
    supports_window_dense,
    window_starts,
)


def dense_sta_oracle(q, k, v, latent_shape, tile, window):
    """Token-level dense attention under the expanded tile mask."""
    mask_tiles = sta_tile_mask(latent_shape, window, tile)  # tile-ORDER mask
    tpt = int(np.prod(tile))
    n = mask_tiles.shape[0] * tpt
    # expand to token granularity in tile order, then permute to raster
    mask_tok = np.kron(mask_tiles, np.ones((tpt, tpt), bool))
    # build tile-order -> raster permutation
    t, h, w = latent_shape
    tt, th, tw = tile
    nt, nh, nw = t // tt, h // th, w // tw
    idx = np.arange(n).reshape(nt, nh, nw, tt, th, tw)
    idx = idx.transpose(0, 3, 1, 4, 2, 5).reshape(n)  # tile-order index of raster pos
    mask_raster = mask_tok[np.ix_(idx, idx)]

    qf = np.asarray(q, np.float32)
    kf = np.asarray(k, np.float32)
    vf = np.asarray(v, np.float32)
    s = np.einsum("bhqd,bhkd->bhqk", qf, kf) * (q.shape[-1] ** -0.5)
    s = np.where(mask_raster[None, None], s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, vf)


@pytest.fixture
def geom():
    latent, tile, window = (4, 6, 16), (2, 3, 8), (3, 3, 3)
    b, h, d = 2, 4, 32
    s = int(np.prod(latent))
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    return latent, tile, window, q, k, v


def test_supports():
    assert supports_window_dense((20, 45, 80), (5, 9, 8))
    assert supports_window_dense((30, 45, 80), (6, 9, 8))
    assert supports_window_dense((20, 30, 52), (4, 6, 4))  # misaligned tw ok
    assert not supports_window_dense((20, 45, 80), (3, 9, 8))  # 3 !| 20


def test_misaligned_tile_w_matches_oracle():
    """tile_w % 8 != 0 (the reference 480p geometry class): the kernel DMAs
    an 8-aligned superset window and masks slack columns with a bias."""
    latent, tile, window = (8, 6, 20), (2, 3, 4), (3, 3, 3)
    b, h, d = 1, 2, 32
    s = int(np.prod(latent))
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    out = sta_window_attention(
        q, k, v, jnp.ones((h,), jnp.int32),
        latent_shape=latent, tile=tile, window=window, interpret=True,
    )
    ref = dense_sta_oracle(q, k, v, latent, tile, window)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_window_starts_clamping():
    starts = window_starts((4, 6, 16), (2, 3, 8), (3, 3, 3))
    # 2x2x2 tiles; window 3 > n on every axis -> win_eff = n, start 0
    assert (starts == 0).all()
    starts = window_starts((8, 6, 32), (2, 3, 8), (3, 3, 3))
    # t axis: 4 tiles, win 3: q=0,1 -> 0; q=2 -> 1*2; q=3 -> 1*2 (clamped)
    t_starts = starts[:, 0].reshape(4, 2, 4)[:, 0, 0]
    assert list(t_starts) == [0, 0, 2, 2]


def test_matches_dense_oracle(geom):
    latent, tile, window, q, k, v = geom
    active = jnp.ones((q.shape[1],), jnp.int32)
    out = sta_window_attention(
        q, k, v, active, latent_shape=latent, tile=tile, window=window,
        interpret=True,
    )
    ref = dense_sta_oracle(q, k, v, latent, tile, window)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_matches_tiled_kernel_path(geom):
    latent, tile, window, q, k, v = geom
    cfg = AttentionConfig(
        latent_shape=latent, sta_window=window, sta_tile=tile,
        sta_block_q=24, sta_block_kv=24,
    )
    ref = sta_attention(q, k, v, cfg, interpret=True)
    active = jnp.ones((q.shape[1],), jnp.int32)
    out = sta_window_attention(
        q, k, v, active, latent_shape=latent, tile=tile, window=window,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_clamped_interior(geom):
    """Geometry with >3 tiles on one axis exercises real clamping."""
    latent, tile, window = (8, 6, 32), (2, 3, 8), (3, 3, 3)
    b, h, d = 1, 2, 32
    s = int(np.prod(latent))
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    out = sta_window_attention(
        q, k, v, jnp.ones((h,), jnp.int32),
        latent_shape=latent, tile=tile, window=window, interpret=True,
    )
    ref = dense_sta_oracle(q, k, v, latent, tile, window)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_inactive_heads_zero(geom):
    latent, tile, window, q, k, v = geom
    active = jnp.asarray([1, 0, 1, 0], jnp.int32)
    out = sta_window_attention(
        q, k, v, active, latent_shape=latent, tile=tile, window=window,
        interpret=True,
    )
    out = np.asarray(out)
    assert np.all(out[:, 1] == 0) and np.all(out[:, 3] == 0)
    ref = dense_sta_oracle(q, k, v, latent, tile, window)
    np.testing.assert_allclose(out[:, 0], ref[:, 0], rtol=2e-4, atol=2e-4)


def test_joint_window_dense_matches_ref():
    """Window-dense joint STA (video window + dense text tail, separate
    text-row call) vs the chunked joint reference at a tile_w=8 geometry."""
    from vorta_tpu.ops.joint_experts import (
        JointConfig,
        joint_sta_attention,
        joint_sta_attention_ref,
    )
    from vorta_tpu.ops.sta_window import supports_window_dense

    latent, tile = (4, 4, 16), (2, 2, 8)
    assert supports_window_dense(latent, tile)
    vcfg = AttentionConfig(
        latent_shape=latent, sta_window=(3, 3, 3), sta_tile=tile,
        lowres_window=(2, 2, 2), block_q=32, block_kv=32,
        sta_block_q=32, sta_block_kv=32,
    )
    jcfg = JointConfig(video=vcfg, text_len=16)
    b, h, d = 1, 3, 32
    sv = int(np.prod(latent))
    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.float32)

    qv, kv_, vv = mk((b, h, sv, d)), mk((b, h, sv, d)), mk((b, h, sv, d))
    qt, kt, vt = mk((b, h, 16, d)), mk((b, h, 16, d)), mk((b, h, 16, d))
    mask = jnp.arange(16)[None, :] < 11  # ragged text

    video, text = joint_sta_attention(
        qv, kv_, vv, qt, kt, vt, mask, jcfg, interpret=True
    )
    video_r, text_r = joint_sta_attention_ref(
        qv, kv_, vv, qt, kt, vt, mask, jcfg
    )
    np.testing.assert_allclose(
        np.asarray(video), np.asarray(video_r), rtol=3e-4, atol=3e-4
    )
    # only unpadded text rows are defined (caller zeroes the rest)
    np.testing.assert_allclose(
        np.asarray(text)[:, :, :11], np.asarray(text_r)[:, :, :11],
        rtol=3e-4, atol=3e-4,
    )


def test_joint_window_dense_inactive_heads():
    from vorta_tpu.ops.joint_experts import JointConfig, joint_sta_attention

    latent, tile = (4, 4, 16), (2, 2, 8)
    vcfg = AttentionConfig(
        latent_shape=latent, sta_window=(3, 3, 3), sta_tile=tile,
        lowres_window=(2, 2, 2), block_q=32, block_kv=32,
        sta_block_q=32, sta_block_kv=32,
    )
    jcfg = JointConfig(video=vcfg, text_len=16)
    b, h, d = 1, 2, 32
    sv = int(np.prod(latent))
    rng = np.random.default_rng(1)
    mk = lambda shape: jnp.asarray(rng.standard_normal(shape), jnp.float32)
    qv, kv_, vv = mk((b, h, sv, d)), mk((b, h, sv, d)), mk((b, h, sv, d))
    qt, kt, vt = mk((b, h, 16, d)), mk((b, h, 16, d)), mk((b, h, 16, d))
    mask = jnp.ones((1, 16), bool)
    active = jnp.asarray([True, False])
    video, text = joint_sta_attention(
        qv, kv_, vv, qt, kt, vt, mask, jcfg, active=active, interpret=True
    )
    assert np.all(np.asarray(video)[:, 1] == 0)
    assert np.all(np.asarray(text)[:, 1] == 0)
    assert not np.all(np.asarray(video)[:, 0] == 0)


@pytest.mark.parametrize("force", [(2, 1, 1), (1, 3, 2), (2, 3, 2)])
def test_forced_vmem_fallback_paths(force):
    """Exercise the t-supertiled and h-subchunk VMEM fallback paths (they
    only auto-select on fat real-hardware geometries)."""
    latent, tile, window = (8, 6, 32), (2, 3, 8), (3, 3, 3)
    b, h, d = 1, 2, 32
    s = int(np.prod(latent))
    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    out = sta_window_attention(
        q, k, v, jnp.ones((h,), jnp.int32),
        latent_shape=latent, tile=tile, window=window, interpret=True,
        _force=force,
    )
    ref = dense_sta_oracle(q, k, v, latent, tile, window)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)
