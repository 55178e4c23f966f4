"""Per-head routed sparse attention (inference hot path).

The reference gathers a data-dependent number of heads per expert and runs
each expert kernel on its subset (vorta/attention/wan.py:388-438) — dynamic
shapes, head gather/scatter.  Here routing is a *participation mask*: each
expert runs as one kernel call over ALL heads in its natural layout, but a
head's per-row kv-block count is zeroed unless the router assigned it — and
the manual-DMA kernel (ops/flash_manual.py) makes zero-count rows cost
~nothing (one grid cell, no DMA, no MXU).  Outputs sum: every head gets
exactly its expert's output, the other two contribute zeros.

Why not one kernel call with per-head layouts?  Measured on v5e: the common
block size the three layouts force (a multiple of tokens-per-tile small
enough for the 32 sub-tile visibility bits) starves the MXU/DMA pipeline;
three calls at each expert's best geometry + free masked rows is strictly
faster.  Routing stays traced data — same compiled program every step.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AttentionConfig
from ..geometry import cdiv, sta_tile_mask
from .coreset import pool_by_similarity, unpool_by_similarity
from .experts import FULL, LOWRES, STA, lowres_groups_for
from .flash_manual import sparse_flash_attention_manual
from .layout import tile_sequence, untile_sequence
from .sta_pipe import sta_pipe_attention, supports_pipe
from .sta_row import sta_row_attention, supports_row_dense
from .sta_window import prefer_window_dense, sta_window_attention


def _sta_dispatch(q, k, v, active, cfg, scale, interpret):
    """Best eligible STA kernel: grid-pipelined row-dense (v6) when it fits,
    else manual-DMA row-dense (v5), else window-dense (v4)."""
    kw = dict(latent_shape=cfg.latent_shape, tile=cfg.sta_tile,
              window=cfg.sta_window, scale=scale, interpret=interpret)
    if supports_pipe(cfg.latent_shape, cfg.sta_tile, q.shape[-1],
                     q.dtype.itemsize, window=cfg.sta_window):
        return sta_pipe_attention(q, k, v, active, **kw)
    if supports_row_dense(cfg.latent_shape, cfg.sta_tile, q.shape[-1],
                          q.dtype.itemsize, window=cfg.sta_window):
        return sta_row_attention(q, k, v, active, **kw)
    return sta_window_attention(q, k, v, active, **kw)


class ExpertCall(NamedTuple):
    kv_index: np.ndarray  # (1, nq, W) int32
    kv_count: np.ndarray  # (1, nq) int32
    pair_bits: Optional[np.ndarray]  # (1, nq, W) int32 or None
    block_q: int
    block_kv: int
    q_pad: int  # padded q length
    kv_pad: int  # padded kv length
    valid_len: int  # logical kv length


class RoutedGeometry(NamedTuple):
    full: ExpertCall
    lowres: ExpertCall
    sta: ExpertCall
    tokens_per_tile: int


def _dense_call(valid_len: int, block_q: int, block_kv: int, q_len: int) -> ExpertCall:
    """Dense visitation over the first ``valid_len`` kv tokens; q rows wholly
    past ``valid_len`` idle (pooled-padding rows)."""
    q_pad = block_q * cdiv(q_len, block_q)
    kv_pad = block_kv * cdiv(valid_len, block_kv)
    nq = q_pad // block_q
    nkv = kv_pad // block_kv
    idx = np.broadcast_to(np.arange(nkv, dtype=np.int32), (1, nq, nkv)).copy()
    cnt = np.full((1, nq), nkv, np.int32)
    for qi in range(nq):
        if qi * block_q >= valid_len:
            cnt[0, qi] = 0
    return ExpertCall(idx, cnt, None, block_q, block_kv, q_pad, kv_pad, valid_len)


def _sta_blocks(cfg: AttentionConfig):
    """Kernel blocks for the head-batched STA kernel: roughly square (both
    matmul dims fed), capped so the per-cell VMEM window stays modest, and
    the sub-tile pair count fits the 32-bit visibility mask."""
    tpt = cfg.tokens_per_tile
    if tpt % 8:
        raise ValueError(f"tokens_per_tile {tpt} must be a multiple of 8")
    m = max(1, min(5, 512 // tpt))
    k = max(1, min(32 // m, 1024 // tpt))
    return m * tpt, k * tpt


def _sta_call(cfg: AttentionConfig) -> ExpertCall:
    s = cfg.seq_len
    bq, bkv = _sta_blocks(cfg)
    tpt = cfg.tokens_per_tile
    m_sub, k_sub = bq // tpt, bkv // tpt
    q_pad = bq * cdiv(s, bq)
    kv_pad = bkv * cdiv(s, bkv)
    nq, nkv = q_pad // bq, kv_pad // bkv
    tile_mask = sta_tile_mask(cfg.latent_shape, cfg.sta_window, cfg.sta_tile)
    n_tiles = tile_mask.shape[0]

    idx = np.zeros((1, nq, 1), np.int32)
    rows_idx, rows_bits = [], []
    width = 1
    cnt = np.zeros((1, nq), np.int32)
    tmp = []
    for qi in range(nq):
        active = []
        if qi * m_sub < n_tiles:
            for kj in range(nkv):
                b = 0
                for mi in range(m_sub):
                    qt = qi * m_sub + mi
                    if qt >= n_tiles:
                        continue
                    for ki in range(k_sub):
                        kt = kj * k_sub + ki
                        if kt >= n_tiles:
                            continue
                        if tile_mask[qt, kt]:
                            b |= 1 << (mi * k_sub + ki)
                if b:
                    active.append((kj, b))
        tmp.append(active)
        width = max(width, len(active))
    idx = np.zeros((1, nq, width), np.int32)
    bits = np.zeros((1, nq, width), np.int32)
    for qi, active in enumerate(tmp):
        for j, (kj, b) in enumerate(active):
            idx[0, qi, j] = kj
            bits[0, qi, j] = np.int32(np.uint32(b).view(np.int32))
        if active:
            idx[0, qi, len(active):] = active[-1][0]
        cnt[0, qi] = len(active)
    return ExpertCall(idx, cnt, bits, bq, bkv, q_pad, kv_pad, s)


@functools.lru_cache(maxsize=16)
def routed_geometry(cfg: AttentionConfig) -> RoutedGeometry:
    s = cfg.seq_len
    pooled = lowres_groups_for(cfg).pooled_length
    bq, bkv = cfg.block_q, cfg.block_kv
    return RoutedGeometry(
        full=_dense_call(s, bq, bkv, s),
        lowres=_dense_call(pooled, bq, bkv, pooled),
        sta=_sta_call(cfg),
        tokens_per_tile=cfg.tokens_per_tile,
    )


def route_expert_ids(scores: jax.Array, tau: float) -> jax.Array:
    """(B, H, E) soft scores -> (H,) int32 expert ids (top-1, tau fallback).

    Uses the first batch row so CFG pairs route identically (reference:
    wan.py:398)."""
    s0 = scores[0]
    top = jnp.max(s0, axis=-1)
    idx = jnp.argmax(s0, axis=-1).astype(jnp.int32)
    return jnp.where(top < tau, FULL, idx)


def _pad_to(x: jax.Array, target: int) -> jax.Array:
    if x.shape[2] == target:
        return x
    pad = [(0, 0)] * x.ndim
    pad[2] = (0, target - x.shape[2])
    return jnp.pad(x, pad)


def _quantize_per_head(x: jax.Array):
    """Symmetric per-head int8 quantization (dynamic amax).

    Fuses into the producing XLA ops — measured cost on v5e is below noise
    (probe: int8 incl. quantization == int8 kernel alone).
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(0, 2, 3))  # (H,)
    s = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / s[None, :, None, None]), -127, 127
    ).astype(jnp.int8)
    return xq, s


def _masked_call(
    call: ExpertCall,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    active: jax.Array,  # (H,) bool — heads owned by this expert
    tokens_per_tile: int,
    scale,
    interpret,
    qk_int8: bool = False,
) -> jax.Array:
    h = q.shape[1]
    # index/bits tables stay head-shared (SMEM is only ~1MB); just the
    # per-head counts carry the routing mask
    cnt = jnp.where(
        active[:, None],
        jnp.broadcast_to(jnp.asarray(call.kv_count), (h,) + call.kv_count.shape[1:]),
        0,
    )
    qk_scale = None
    out_dtype = q.dtype
    if qk_int8:
        q, sq = _quantize_per_head(q)
        k, sk = _quantize_per_head(k)
        qk_scale = sq * sk
    out = sparse_flash_attention_manual(
        _pad_to(q, call.q_pad),
        _pad_to(k, call.kv_pad),
        _pad_to(v, call.kv_pad),
        jnp.asarray(call.kv_index),
        cnt,
        scale=scale,
        block_q=call.block_q,
        block_kv=call.block_kv,
        kv_valid_len=call.valid_len,
        pair_bits=jnp.asarray(call.pair_bits) if call.pair_bits is not None else None,
        tokens_per_tile=tokens_per_tile if call.pair_bits is not None else None,
        interpret=interpret,
        softmax="fast",  # all callers route qk-normed DiT tensors here
        qk_scale=qk_scale,
    )
    return out.astype(out_dtype)


def fused_routed_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    expert_id: jax.Array,  # (H,) int32
    cfg: AttentionConfig,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """Hard-routed attention, dispatched per head.

    When the window-dense STA kernel applies, every head runs exactly its
    expert under a per-head ``lax.switch`` and the outputs concatenate —
    no cross-expert combine adds, no zero-fill for skipped experts, and
    every expert's cost (including the lowres pool/unpool data movement)
    scales with the heads actually routed to it.  Geometries on the tiled
    STA fallback keep the three guarded expert calls (the fallback kernel
    wants all its heads batched and packed).
    """
    geo = routed_geometry(cfg)
    groups = lowres_groups_for(cfg)
    s = cfg.seq_len
    qk8 = bool(getattr(cfg, "qk_int8", False))

    def lowres_head(qh, kh, vh):
        # fused Pallas pool: one slab read of q/k/v, matching shared
        # (reference wan.py:250-255); the pool pass hands its matching to
        # unpool as packed slot ids — no q re-read, no matching recompute
        from .coreset_pallas import pool_qkv, unpool

        pq, pk, pv, picks = pool_qkv(qh, kh, vh, groups, return_picks=True,
                                     interpret=interpret)
        out_p = _masked_call(
            geo.lowres, pq, pk, pv,
            jnp.ones((1,), bool), geo.tokens_per_tile, scale, interpret,
            qk_int8=qk8,
        )[:, :, : groups.pooled_length]
        return unpool(out_p, qh, groups, picks=picks,
                      interpret=interpret).astype(q.dtype)

    def lowres_all_perhead():
        # Per-HEAD cond: only the routed heads' data moves, at the cost of
        # 3 kernel launches per routed head plus a 12-way concat.
        def one_head(hh):
            return jax.lax.cond(
                expert_id[hh] == LOWRES,
                lambda: lowres_head(
                    q[:, hh : hh + 1], k[:, hh : hh + 1], v[:, hh : hh + 1]
                ),
                lambda: jnp.zeros(
                    (q.shape[0], 1, q.shape[2], q.shape[3]), q.dtype
                ),
            )

        return jnp.concatenate(
            [one_head(hh) for hh in range(q.shape[1])], axis=1
        )

    def lowres_all_hybrid():
        # Per-head cond POOL (only routed heads' data moves) into one
        # concatenated pooled buffer, then ONE masked attention call over
        # all heads (zero-count rows cost ~nothing in flash_manual), then
        # per-head cond UNPOOL.  MEASURED NEGATIVE on v5e (round 5):
        # mixed 5L/7S 54.1 ms vs 50.8 per-head, all-lowres 69.8 vs 66.7 —
        # the pooled-buffer concat (3 x (B,H,P,D) materialized) and the
        # masked call's zero-row grid sweep cost more than the 4 saved
        # kernel launches.  Kept selectable (VORTA_LOWRES_DISPATCH=hybrid)
        # as the record of the experiment.
        from .coreset_pallas import pool_qkv, unpool

        h = q.shape[1]
        p_len = groups.pooled_length
        geom = groups._geom  # type: ignore[attr-defined]
        t, hh_, w = geom.latent_shape
        wt, wh, ww = geom.window
        picks_shape = (q.shape[0], 1, t // wt, hh_ // wh, w // ww,
                       groups.num_kept_margins)

        def pool_head(i):
            def do():
                return pool_qkv(q[:, i : i + 1], k[:, i : i + 1],
                                v[:, i : i + 1], groups, return_picks=True,
                                interpret=interpret)

            def skip():
                z = jnp.zeros((q.shape[0], 1, p_len, q.shape[3]), q.dtype)
                return z, z, z, jnp.zeros(picks_shape, jnp.int32)

            return jax.lax.cond(expert_id[i] == LOWRES, do, skip)

        pooled = [pool_head(i) for i in range(h)]
        pq = jnp.concatenate([p[0] for p in pooled], axis=1)
        pk = jnp.concatenate([p[1] for p in pooled], axis=1)
        pv = jnp.concatenate([p[2] for p in pooled], axis=1)
        out_p = _masked_call(
            geo.lowres, pq, pk, pv, expert_id == LOWRES,
            geo.tokens_per_tile, scale, interpret, qk_int8=qk8,
        )[:, :, :p_len]

        def unpool_head(i):
            return jax.lax.cond(
                expert_id[i] == LOWRES,
                lambda: unpool(out_p[:, i : i + 1], q[:, i : i + 1], groups,
                               picks=pooled[i][3],
                               interpret=interpret).astype(q.dtype),
                lambda: jnp.zeros(
                    (q.shape[0], 1, q.shape[2], q.shape[3]), q.dtype
                ),
            )

        return jnp.concatenate([unpool_head(i) for i in range(h)], axis=1)

    def lowres_all_batched():
        # ONE pool + attend + unpool over all heads with a traced packed
        # head_map intended to elide padded positions' DMA via block
        # revisiting.  MEASURED NEGATIVE on v5e: headmap@5-of-12 heads
        # (16.6 ms chain) == headmap@12 (15.6) == plain (16.0) — the legacy
        # PrefetchScalarGridSpec pipeline does not elide copies when the
        # index map depends on prefetched scalars, so DMA does NOT scale
        # with the routed head count and mixed-5L7S measured 58.7 ms vs
        # 54.5 for the per-head cond path (which truly moves only routed
        # heads' data).  Kept selectable for future pipeline versions.
        from .coreset_pallas import pool_qkv, unpool

        h = q.shape[1]
        lh = expert_id == LOWRES
        n_act = jnp.maximum(jnp.sum(lh.astype(jnp.int32)), 1)
        order = jnp.argsort(~lh)  # routed heads first, stable
        head_map = jnp.take(order, jnp.minimum(jnp.arange(h), n_act - 1))
        pq, pk, pv, picks = pool_qkv(
            q, k, v, groups, head_map=head_map, num_active=n_act,
            return_picks=True, interpret=interpret,
        )
        out_p = _masked_call(
            geo.lowres, pq, pk, pv, lh, geo.tokens_per_tile, scale, interpret,
            qk_int8=qk8,
        )[:, :, : groups.pooled_length]
        up = unpool(
            out_p, q, groups, head_map=head_map, num_active=n_act,
            picks=picks, interpret=interpret,
        ).astype(q.dtype)
        # heads outside head_map come back uninitialized — mask them out
        return jnp.where(lh[None, :, None, None], up, 0)

    # fused dispatch whenever _sta_dispatch has an efficient kernel: the
    # window-dense heuristic (tiles >= 192 tokens) OR the grid-pipelined v6
    # kernel (covers 480p's 96-token tiles via the grouped-width variant,
    # which replaced the tiled pair-bits fallback as the better choice there)
    if prefer_window_dense(cfg.latent_shape, cfg.sta_tile) or supports_pipe(
        cfg.latent_shape, cfg.sta_tile, q.shape[-1], q.dtype.itemsize,
        window=cfg.sta_window,
    ):
        if os.environ.get("VORTA_ROUTED_DISPATCH", "masked") == "masked":
            # one launch per EXPERT instead of one per head: the v6 STA
            # kernel skips compute for inactive heads (their slab streams
            # hide under active heads), the masked-table kernel idles
            # zero-count rows, and lowres keeps per-head pooling conds.
            # Costs two full-size combine adds; saves ~10 per-head kernel
            # launches per block.
            def sta_all():
                return _sta_dispatch(
                    q, k, v, (expert_id == STA).astype(jnp.int32),
                    cfg, scale, interpret,
                )

            def full_all():
                return _masked_call(
                    geo.full, q, k, v, expert_id == FULL,
                    geo.tokens_per_tile, scale, interpret, qk_int8=qk8,
                )[:, :, :s]

            lowres_all = {
                "batched": lowres_all_batched,
                "hybrid": lowres_all_hybrid,
            }.get(os.environ.get("VORTA_LOWRES_DISPATCH", ""),
                  lowres_all_perhead)

            def guard(e, branch):
                return jax.lax.cond(
                    jnp.any(expert_id == e), branch,
                    lambda: jnp.zeros(q.shape, q.dtype),
                )

            # Negative result (round 3, measured on TPU): dropping the STA
            # and LOWRES guards (the masked kernels already skip inactive
            # heads) was 2880 -> 2985 ms e2e — the conds' expert-empty
            # early-outs beat the unconditional masked launches. Keep guards.
            return (
                guard(STA, sta_all)
                + guard(FULL, full_all)
                + guard(LOWRES, lowres_all)
            )

        def head_out(hh):
            qh = q[:, hh : hh + 1]
            kh = k[:, hh : hh + 1]
            vh = v[:, hh : hh + 1]

            def full_h():
                return _masked_call(
                    geo.full, qh, kh, vh, jnp.ones((1,), bool),
                    geo.tokens_per_tile, scale, interpret, qk_int8=qk8,
                )[:, :, :s]

            def lowres_h():
                return lowres_head(qh, kh, vh)

            def sta_h():
                return _sta_dispatch(
                    qh, kh, vh, jnp.ones((1,), jnp.int32), cfg, scale, interpret
                )

            return jax.lax.switch(
                expert_id[hh], [full_h, lowres_h, sta_h]
            )

        return jnp.concatenate(
            [head_out(hh) for hh in range(q.shape[1])], axis=1
        )

    def guarded(active, branch):
        return jax.lax.cond(
            jnp.any(active),
            branch,
            lambda: jnp.zeros(q.shape, q.dtype),
        )

    def full_branch():
        active = expert_id == FULL
        return _masked_call(
            geo.full, q, k, v, active, geo.tokens_per_tile, scale, interpret,
            qk_int8=qk8,
        )[:, :, :s]

    def lowres_branch():
        if os.environ.get("VORTA_LOWRES_DISPATCH") == "batched":
            return lowres_all_batched()
        return lowres_all_perhead()

    def sta_branch():
        # only reached when neither the window-dense heuristic nor the v6
        # pipe kernel applied above: always the tiled pair-bits fallback
        active = expert_id == STA
        shape, tile = cfg.latent_shape, cfg.sta_tile
        from .sta_batched import sta_flash_headbatched

        # fallback (tile_w not 8-aligned): tiled layout + pair-bit kernel;
        # pack routed heads into the leading head groups so fully-inactive
        # groups skip
        perm = jnp.argsort(~active)  # active heads first, stable
        inv_perm = jnp.argsort(perm)
        call = geo.sta
        out_t = sta_flash_headbatched(
            _pad_to(jnp.take(tile_sequence(q, shape, tile), perm, axis=1), call.q_pad),
            _pad_to(jnp.take(tile_sequence(k, shape, tile), perm, axis=1), call.kv_pad),
            _pad_to(jnp.take(tile_sequence(v, shape, tile), perm, axis=1), call.kv_pad),
            jnp.asarray(call.kv_index),
            jnp.asarray(call.kv_count),
            jnp.take(active, perm),
            pair_bits=jnp.asarray(call.pair_bits),
            tokens_per_tile=geo.tokens_per_tile,
            scale=scale,
            block_q=call.block_q,
            block_kv=call.block_kv,
            interpret=interpret,
            softmax="fast",
        )[:, :, :s]
        out_t = jnp.take(out_t, inv_perm, axis=1)
        return untile_sequence(out_t, shape, tile)

    out = guarded(expert_id == FULL, full_branch)
    out = out + guarded(expert_id == LOWRES, lowres_branch)
    out = out + guarded(expert_id == STA, sta_branch)
    return out
