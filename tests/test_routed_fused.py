import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vorta_tpu.config import AttentionConfig
from vorta_tpu.ops.experts import (
    FULL,
    LOWRES,
    STA,
    full_attention,
    lowres_attention,
    routed_attention,
    sta_attention,
)
from vorta_tpu.ops.routed_fused import (
    fused_routed_attention,
    route_expert_ids,
    routed_geometry,
)

# geometry where kernel blocks span multiple tiles (exercises pair bits):
# latent (4,4,8) = 128 tokens, tile (2,2,2) = 8 tokens/tile, 16 tiles
CFG = AttentionConfig(
    latent_shape=(4, 4, 8),
    sta_window=(3, 3, 3),
    sta_tile=(2, 2, 2),
    lowres_window=(2, 2, 2),
    lowres_reduction=0.5,
    block_q=32,  # fused picks 32 = 4 tiles per q block
    block_kv=16,  # 2 tiles per kv block
    sta_block_q=8,
    sta_block_kv=8,
)
S = CFG.seq_len


def rand_qkv(key, b=2, h=4, d=8):
    kq, kk, kv = jax.random.split(key, 3)
    return (
        jax.random.normal(kq, (b, h, S, d)),
        jax.random.normal(kk, (b, h, S, d)),
        jax.random.normal(kv, (b, h, S, d)),
    )


def test_routed_geometry_shapes():
    geo = routed_geometry(CFG)
    # sta blocks are tile multiples with <=32 visibility bits
    assert geo.sta.block_q % CFG.tokens_per_tile == 0
    assert geo.sta.block_kv % CFG.tokens_per_tile == 0
    assert (geo.sta.block_q // CFG.tokens_per_tile) * (
        geo.sta.block_kv // CFG.tokens_per_tile
    ) <= 32
    # full expert visits every valid kv block
    assert geo.full.kv_count.max() == -(-S // geo.full.block_kv)
    # sta expert visits fewer blocks than full per q row (sparser)
    assert geo.sta.pair_bits is not None


@pytest.mark.parametrize("expert,ref_fn", [
    (FULL, full_attention),
    (LOWRES, lowres_attention),
    (STA, sta_attention),
])
def test_fused_single_expert_matches_reference(expert, ref_fn):
    q, k, v = rand_qkv(jax.random.PRNGKey(expert))
    ids = jnp.full((q.shape[1],), expert, jnp.int32)
    out = fused_routed_attention(q, k, v, ids, CFG, interpret=True)
    ref = ref_fn(q, k, v, CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5)


def test_fused_mixed_heads():
    q, k, v = rand_qkv(jax.random.PRNGKey(7))
    ids = jnp.asarray([FULL, LOWRES, STA, FULL], jnp.int32)
    out = fused_routed_attention(q, k, v, ids, CFG, interpret=True)
    full = full_attention(q, k, v, CFG, interpret=True)
    low = lowres_attention(q, k, v, CFG, interpret=True)
    sta = sta_attention(q, k, v, CFG, interpret=True)
    ref = jnp.stack([full[:, 0], low[:, 1], sta[:, 2], full[:, 3]], axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5)


def test_hard_mode_equals_hard_ref():
    q, k, v = rand_qkv(jax.random.PRNGKey(9))
    b, h = q.shape[:2]
    scores = jax.nn.softmax(
        3.0 * jax.random.normal(jax.random.PRNGKey(3), (b, h, 3)), axis=-1
    )
    out = routed_attention(q, k, v, scores, CFG, mode="hard", interpret=True)
    ref = routed_attention(q, k, v, scores, CFG, mode="hard_ref", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5)


def test_route_expert_ids_tau():
    scores = jnp.asarray([[[0.2, 0.5, 0.3], [0.31, 0.33, 0.36], [0.05, 0.05, 0.9]]])
    ids = route_expert_ids(scores, tau=0.4)
    np.testing.assert_array_equal(np.asarray(ids), [LOWRES, FULL, STA])


def test_masked_dispatch_matches_switch_window_dense(monkeypatch):
    """Window-dense geometry (tokens/tile >= 192): the default per-expert
    masked dispatch must equal the per-head lax.switch dispatch and the
    expert references."""
    from vorta_tpu.ops.sta_window import prefer_window_dense

    cfg = AttentionConfig(
        latent_shape=(4, 6, 16),
        sta_window=(3, 3, 3),
        sta_tile=(4, 6, 8),
        lowres_window=(2, 2, 2),
        block_q=32,
        block_kv=32,
    )
    assert prefer_window_dense(cfg.latent_shape, cfg.sta_tile)
    b, h, d = 1, 4, 8
    ks = jax.random.split(jax.random.PRNGKey(21), 3)
    q, k, v = (jax.random.normal(ks[i], (b, h, cfg.seq_len, d)) for i in range(3))
    ids = jnp.asarray([FULL, LOWRES, STA, STA], jnp.int32)

    monkeypatch.setenv("VORTA_ROUTED_DISPATCH", "masked")
    out_masked = fused_routed_attention(q, k, v, ids, cfg, interpret=True)
    monkeypatch.setenv("VORTA_ROUTED_DISPATCH", "switch")
    out_switch = fused_routed_attention(q, k, v, ids, cfg, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_switch), rtol=3e-5, atol=3e-5
    )
    full = full_attention(q, k, v, cfg, interpret=True)
    low = lowres_attention(q, k, v, cfg, interpret=True)
    sta = sta_attention(q, k, v, cfg, interpret=True)
    ref = jnp.stack([full[:, 0], low[:, 1], sta[:, 2], sta[:, 3]], axis=1)
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(ref), rtol=3e-5, atol=3e-5
    )


def test_fused_under_jit_with_traced_ids():
    q, k, v = rand_qkv(jax.random.PRNGKey(11))

    @jax.jit
    def f(q, k, v, ids):
        return fused_routed_attention(q, k, v, ids, CFG, interpret=True)

    ids1 = jnp.asarray([FULL, STA, LOWRES, STA], jnp.int32)
    ids2 = jnp.asarray([STA, STA, STA, STA], jnp.int32)
    out1 = f(q, k, v, ids1)
    out2 = f(q, k, v, ids2)  # same compile, different routing
    ref2 = sta_attention(q, k, v, CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), rtol=3e-5, atol=3e-5)
    assert np.abs(np.asarray(out1[:, 0]) - np.asarray(out2[:, 0])).max() > 1e-4


def test_fused_qk_int8_close_to_bf16():
    """Serving-mode int8 QK^T (cfg.qk_int8): full + lowres experts run the
    QK dot on the int8 MXU path with dynamic per-head scales; output must
    stay within standard int8 quantization noise of the bf16 path."""
    import dataclasses

    q, k, v = rand_qkv(jax.random.PRNGKey(21))
    cfg8 = dataclasses.replace(CFG, qk_int8=True)
    ids = jnp.asarray([FULL, LOWRES, STA, FULL], jnp.int32)
    ref = fused_routed_attention(q, k, v, ids, CFG, interpret=True)
    out = fused_routed_attention(q, k, v, ids, cfg8, interpret=True)
    ref = np.asarray(ref, np.float32)
    out = np.asarray(out, np.float32)
    # STA heads are untouched (bf16 kernel) — must be bitwise-equal
    np.testing.assert_array_equal(out[:, 2], ref[:, 2])
    # int8-QK heads: relative error bounded by quantization noise
    denom = np.maximum(np.abs(ref).mean(), 1e-6)
    rel = np.abs(out - ref).mean() / denom
    assert rel < 0.05, rel
    # and the config round-trips through json with the new field
    assert AttentionConfig.from_json(cfg8.to_json()).qk_int8 is True
