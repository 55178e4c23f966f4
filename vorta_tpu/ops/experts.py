"""The three attention experts and routing combine.

Experts (reference: vorta/attention/wan.py TripleTrain/TripleEval):
  0. full 3D attention over the raster sequence
  1. low-resolution attention over the similarity-pooled sequence
  2. sliding-tile attention over the tile-contiguous sequence

All experts run through the same block-sparse Pallas kernel
(:mod:`vorta_tpu.ops.flash`); only their static block tables and sequence
layouts differ.  Soft routing (training) weights all three outputs by the
router scores; hard routing (inference) one-hots the scores with a
``tau_sparse`` confidence fallback to full attention.

Hard routing dispatches per head through ops/routed_fused (participation-
masked kernels); "hard_ref" keeps the evaluate-everything-and-select
formulation as the fused path's oracle.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AttentionConfig
from ..geometry import (
    LowresGroups,
    build_lowres_groups,
    cdiv,
    expand_tile_mask,
    sta_tile_mask,
)
from .coreset import pool_by_similarity, unpool_by_similarity
from .flash import BlockTables, dense_tables, make_sparse_attention, tables_from_block_mask
from .layout import tile_sequence, untile_sequence

FULL, LOWRES, STA = 0, 1, 2


@functools.lru_cache(maxsize=32)
def lowres_groups_for(cfg: AttentionConfig) -> LowresGroups:
    return build_lowres_groups(cfg.latent_shape, cfg.lowres_window, cfg.lowres_reduction)


@functools.lru_cache(maxsize=32)
def _full_tables(cfg: AttentionConfig):
    s = cfg.seq_len
    nq = cdiv(s, cfg.block_q)
    nkv = cdiv(s, cfg.block_kv)
    return dense_tables(nq, nkv), nq * cfg.block_q, nkv * cfg.block_kv


@functools.lru_cache(maxsize=32)
def _lowres_tables(cfg: AttentionConfig):
    p = lowres_groups_for(cfg).pooled_length
    nq = cdiv(p, cfg.block_q)
    nkv = cdiv(p, cfg.block_kv)
    kv_index = np.broadcast_to(
        np.arange(nkv, dtype=np.int32), (1, nq, nkv)
    ).copy()
    kv_count = np.full((1, nq), nkv, dtype=np.int32)
    # q blocks entirely past the pooled length do no work
    for qi in range(nq):
        if qi * cfg.block_q >= p:
            kv_count[0, qi] = 0
    return BlockTables(kv_index=kv_index, kv_count=kv_count), nq * cfg.block_q, nkv * cfg.block_kv


@functools.lru_cache(maxsize=32)
def _sta_tables(cfg: AttentionConfig):
    bq, bkv = cfg.sta_blocks
    tpt = cfg.tokens_per_tile
    if tpt % bq or tpt % bkv:
        raise ValueError(
            f"sta blocks ({bq},{bkv}) must divide tokens_per_tile {tpt}"
        )
    tile_mask = sta_tile_mask(cfg.latent_shape, cfg.sta_window, cfg.sta_tile)
    block_mask = expand_tile_mask(tile_mask, tpt, bq, bkv)
    return tables_from_block_mask(block_mask)


def _pad_seq(x: jax.Array, target: int) -> jax.Array:
    s = x.shape[2]
    if s == target:
        return x
    pad = [(0, 0)] * x.ndim
    pad[2] = (0, target - s)
    return jnp.pad(x, pad)


def full_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, cfg: AttentionConfig,
    scale: Optional[float] = None, interpret: bool = False,
) -> jax.Array:
    """Expert 0: dense attention over the raster sequence."""
    tab, sq_pad, skv_pad = _full_tables(cfg)
    s = q.shape[2]
    attn = make_sparse_attention(
        tab,
        n_kv_blocks=skv_pad // cfg.block_kv,
        scale=scale,
        block_q=cfg.block_q,
        block_kv=cfg.block_kv,
        kv_valid_len=s if s != skv_pad else None,
        interpret=interpret,
    )
    out = attn(_pad_seq(q, sq_pad), _pad_seq(k, skv_pad), _pad_seq(v, skv_pad))
    return out[:, :, :s]


def lowres_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, cfg: AttentionConfig,
    scale: Optional[float] = None, interpret: bool = False,
) -> jax.Array:
    """Expert 1: pool by similarity to Q's matching, attend, unpool.

    Dropped positions receive their group center's attention output
    (reference: coreset_select.py:127-185).
    """
    groups = lowres_groups_for(cfg)
    pq, matching = pool_by_similarity(q, groups)
    pk, _ = pool_by_similarity(k, groups, matching)
    pv, _ = pool_by_similarity(v, groups, matching)

    tab, sq_pad, skv_pad = _lowres_tables(cfg)
    p = groups.pooled_length
    attn = make_sparse_attention(
        tab,
        n_kv_blocks=skv_pad // cfg.block_kv,
        scale=scale,
        block_q=cfg.block_q,
        block_kv=cfg.block_kv,
        kv_valid_len=p if p != skv_pad else None,
        interpret=interpret,
    )
    pooled_out = attn(_pad_seq(pq, sq_pad), _pad_seq(pk, skv_pad), _pad_seq(pv, skv_pad))
    return unpool_by_similarity(pooled_out[:, :, :p], groups, matching).astype(q.dtype)


def sta_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, cfg: AttentionConfig,
    scale: Optional[float] = None, interpret: bool = False,
) -> jax.Array:
    """Expert 2: sliding-tile attention over the tile-contiguous layout.

    This is the DIFFERENTIABLE path (training soft-routing, and the oracle
    for the fused hard path); inference hard routing instead dispatches to
    the zero-relayout window-dense kernel (ops/sta_window.py) via
    ops/routed_fused.
    """
    bq, bkv = cfg.sta_blocks
    shape, tile = cfg.latent_shape, cfg.sta_tile
    tq = tile_sequence(q, shape, tile)
    tk = tile_sequence(k, shape, tile)
    tv = tile_sequence(v, shape, tile)
    tab = _sta_tables(cfg)
    attn = make_sparse_attention(
        tab,
        n_kv_blocks=cfg.seq_len // bkv,
        scale=scale,
        block_q=bq,
        block_kv=bkv,
        interpret=interpret,
    )
    out = attn(tq, tk, tv)
    return untile_sequence(out, shape, tile)


def padded_dense_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    block_q: Optional[int] = None, block_kv: int = 512,
    scale: Optional[float] = None, interpret: bool = False,
) -> jax.Array:
    """Dense attention for arbitrary (Sq, Skv), e.g. cross-attention to text.

    Pads both sides to kernel blocks and masks the padded kv tail.  With
    ``block_q=None`` the block is picked automatically: big q blocks for the
    short-KV case (cross-attention to text), where per-grid-cell bookkeeping
    dominates the one tiny kv step (measured 3.5 -> ~1 ms/block at Wan 720p).
    """
    sq, skv = q.shape[2], k.shape[2]
    if block_q is None:
        block_q = 2048 if (skv <= 512 and sq >= 8192) else 512
    block_q = min(block_q, max(8, 1 << (sq - 1).bit_length()))
    block_kv = min(block_kv, max(8, 1 << (skv - 1).bit_length()))
    nq, nkv = cdiv(sq, block_q), cdiv(skv, block_kv)
    tab = dense_tables(nq, nkv)
    attn = make_sparse_attention(
        tab,
        n_kv_blocks=nkv,
        scale=scale,
        block_q=block_q,
        block_kv=block_kv,
        kv_valid_len=skv if skv != nkv * block_kv else None,
        interpret=interpret,
    )
    out = attn(_pad_seq(q, nq * block_q), _pad_seq(k, nkv * block_kv), _pad_seq(v, nkv * block_kv))
    return out[:, :, :sq]


def harden_scores(scores: jax.Array, tau: float) -> jax.Array:
    """(B, H, E) soft scores -> one-hot with low-confidence fallback to full.

    Uses the first batch element's scores for every batch row so CFG pairs
    route identically (reference: wan.py:398 "use the 1st sample").
    """
    s0 = scores[0]  # (H, E)
    top = jnp.max(s0, axis=-1)
    idx = jnp.argmax(s0, axis=-1)
    idx = jnp.where(top < tau, FULL, idx)
    onehot = jax.nn.one_hot(idx, scores.shape[-1], dtype=scores.dtype)
    return jnp.broadcast_to(onehot[None], scores.shape)


def routed_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scores: jax.Array,
    cfg: AttentionConfig,
    mode: str = "soft",
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """Run the three experts and combine by routing scores.

    mode="soft": training-time weighted mixture (reference: wan.py:296-300).
    mode="hard": inference-time top-1 with tau_sparse fallback, dispatched
    per head through the fused single-kernel path.
    mode="hard_ref": same routing decision evaluated by running every expert
    and selecting (reference-style; used as the fused path's oracle).
    """
    if mode == "hard":
        from .routed_fused import fused_routed_attention, route_expert_ids

        expert_id = jax.lax.stop_gradient(route_expert_ids(scores, cfg.tau_sparse))
        return fused_routed_attention(
            q, k, v, expert_id, cfg, scale=scale, interpret=interpret
        )
    if mode == "hard_ref":
        scores = jax.lax.stop_gradient(harden_scores(scores, cfg.tau_sparse))
    elif mode != "soft":
        raise ValueError(f"unknown routing mode {mode!r}")

    outs = jnp.stack(
        [
            full_attention(q, k, v, cfg, scale=scale, interpret=interpret),
            lowres_attention(q, k, v, cfg, scale=scale, interpret=interpret),
            sta_attention(q, k, v, cfg, scale=scale, interpret=interpret),
        ],
        axis=2,
    )  # (B, H, E, S, D)
    w = scores.astype(jnp.float32)[:, :, :, None, None]
    return jnp.sum(w * outs.astype(jnp.float32), axis=2).astype(q.dtype)
