import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vorta_tpu.config import AttentionConfig
from vorta_tpu.geometry import expand_tile_mask, sta_tile_mask
from vorta_tpu.ops.attention_ref import attention_dense, expand_block_mask
from vorta_tpu.ops.coreset import pool_by_similarity, unpool_by_similarity
from vorta_tpu.ops.experts import (
    FULL,
    STA,
    full_attention,
    harden_scores,
    lowres_attention,
    lowres_groups_for,
    routed_attention,
    sta_attention,
)
from vorta_tpu.ops.layout import tile_sequence, untile_sequence


# tiny geometry: latent (4, 4, 4) = 64 tokens; tile (2,2,2)=8 tokens/tile;
# lowres window (2,2,2) keeps 3 of 8 per group
CFG = AttentionConfig(
    latent_shape=(4, 4, 4),
    sta_window=(3, 3, 1),
    sta_tile=(2, 2, 2),
    lowres_window=(2, 2, 2),
    lowres_reduction=0.5,
    block_q=16,
    block_kv=16,
    sta_block_q=8,
    sta_block_kv=8,
)
S = CFG.seq_len


def rand_qkv(key, b=2, h=2, d=8):
    kq, kk, kv = jax.random.split(key, 3)
    return (
        jax.random.normal(kq, (b, h, S, d)),
        jax.random.normal(kk, (b, h, S, d)),
        jax.random.normal(kv, (b, h, S, d)),
    )


def test_full_expert_matches_dense():
    q, k, v = rand_qkv(jax.random.PRNGKey(0))
    out = full_attention(q, k, v, CFG, interpret=True)
    ref = attention_dense(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_full_expert_nondivisible_seq():
    # 64 tokens with block 24 -> padded to 72, tail masked
    cfg = AttentionConfig(
        latent_shape=(4, 4, 4), sta_tile=(2, 2, 2), block_q=24, block_kv=24
    )
    q, k, v = rand_qkv(jax.random.PRNGKey(1))
    out = full_attention(q, k, v, cfg, interpret=True)
    ref = attention_dense(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_lowres_expert_matches_manual():
    q, k, v = rand_qkv(jax.random.PRNGKey(2))
    out = lowres_attention(q, k, v, CFG, interpret=True)

    groups = lowres_groups_for(CFG)
    pq, matching = pool_by_similarity(q, groups)
    pk, _ = pool_by_similarity(k, groups, matching)
    pv, _ = pool_by_similarity(v, groups, matching)
    ref = unpool_by_similarity(attention_dense(pq, pk, pv), groups, matching)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_lowres_pooled_len_not_block_aligned():
    # pooled length = 8 groups * 4 = 32; block 24 -> padded to 48
    cfg = AttentionConfig(
        latent_shape=(4, 4, 4), sta_tile=(2, 2, 2), lowres_window=(2, 2, 2),
        block_q=24, block_kv=24,
    )
    q, k, v = rand_qkv(jax.random.PRNGKey(3))
    out = lowres_attention(q, k, v, cfg, interpret=True)
    groups = lowres_groups_for(cfg)
    pq, matching = pool_by_similarity(q, groups)
    pk, _ = pool_by_similarity(k, groups, matching)
    pv, _ = pool_by_similarity(v, groups, matching)
    ref = unpool_by_similarity(attention_dense(pq, pk, pv), groups, matching)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_sta_expert_matches_masked_dense():
    q, k, v = rand_qkv(jax.random.PRNGKey(4))
    out = sta_attention(q, k, v, CFG, interpret=True)

    # oracle: attention in tiled layout with the expanded tile mask, untiled
    tile_mask = sta_tile_mask(CFG.latent_shape, CFG.sta_window, CFG.sta_tile)
    bm = expand_tile_mask(tile_mask, CFG.tokens_per_tile, 8, 8)
    tq = tile_sequence(q, CFG.latent_shape, CFG.sta_tile)
    tk = tile_sequence(k, CFG.latent_shape, CFG.sta_tile)
    tv = tile_sequence(v, CFG.latent_shape, CFG.sta_tile)
    ref_tiled = attention_dense(
        tq, tk, tv, mask=expand_block_mask(jnp.asarray(bm[None]), 8, 8)
    )
    ref = untile_sequence(ref_tiled, CFG.latent_shape, CFG.sta_tile)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_harden_scores_top1_and_tau():
    scores = jnp.asarray(
        [[[0.2, 0.5, 0.3], [0.25, 0.28, 0.47], [0.32, 0.31, 0.37]]]
    )  # (1, 3 heads, 3 experts)
    hard = harden_scores(scores, tau=0.4)
    # head0: top1=lowres(0.5) >= tau -> lowres; head1: sta 0.47 -> sta;
    # head2: top 0.37 < tau -> fallback FULL
    expect = np.array([[0, 1, 0], [0, 0, 1], [1, 0, 0]], dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(hard[0]), expect)


def test_harden_uses_first_batch_element():
    scores = jnp.stack(
        [
            jnp.asarray([[0.8, 0.1, 0.1]]),
            jnp.asarray([[0.1, 0.8, 0.1]]),
        ]
    )  # (2, 1, 3) — batch rows disagree
    hard = harden_scores(scores, tau=0.3)
    np.testing.assert_array_equal(np.asarray(hard[0]), np.asarray(hard[1]))
    assert hard[1, 0, FULL] == 1.0  # batch 0's decision wins


def test_routed_soft_one_hot_equals_single_expert():
    # soft combine with a one-hot score must equal running just that expert
    q, k, v = rand_qkv(jax.random.PRNGKey(5))
    b, h = q.shape[:2]
    scores = jnp.zeros((b, h, 3)).at[:, :, STA].set(1.0)
    out = routed_attention(q, k, v, scores, CFG, mode="soft", interpret=True)
    ref = sta_attention(q, k, v, CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_routed_hard_matches_manual_head_mix():
    q, k, v = rand_qkv(jax.random.PRNGKey(6))
    b, h = q.shape[:2]
    # head 0 -> full confidently, head 1 -> lowres confidently
    scores = jnp.broadcast_to(
        jnp.asarray([[0.9, 0.05, 0.05], [0.05, 0.9, 0.05]])[None], (b, h, 3)
    )
    out = routed_attention(q, k, v, scores, CFG, mode="hard", interpret=True)
    full = full_attention(q, k, v, CFG, interpret=True)
    low = lowres_attention(q, k, v, CFG, interpret=True)
    ref = jnp.stack([full[:, 0], low[:, 1]], axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_routed_soft_grad_flows_to_scores():
    q, k, v = rand_qkv(jax.random.PRNGKey(7), b=1, h=1)
    scores = jnp.full((1, 1, 3), 1.0 / 3.0)

    def loss(s):
        return jnp.sum(routed_attention(q, k, v, s, CFG, mode="soft", interpret=True) ** 2)

    g = jax.grad(loss)(scores)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)
