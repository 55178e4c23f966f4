"""Window-dense sliding-tile attention (kernel v4 — zero-relayout).

Sliding-tile attention with a center-clamped window is per-q-tile DENSE: every
query tile attends to exactly its prod(window) neighbour tiles, all of whose
tokens are fully visible (the reference mask is tile-granular —
vorta/attention/sliding_attn_flex.py:101-128).  Earlier kernels flattened the
sequence to tile-contiguous order and masked sub-tile visibility with pair
bits; the flatten/unflatten relayouts and the per-block VPU masking were ~45%
of the measured STA time at 720p.

This kernel instead reads the window straight out of RASTER-order K/V with
strided box DMAs over a (B, H, T, Hh, W, D) view (a free reshape of the model
tensor), so there is no sequence relayout anywhere and no in-kernel masking at
all: per grid cell = one (batch, head-group, q-tile), the window streams
through VMEM in (heads, tile_t, tile_h, window_w·tile_w) chunks and each chunk
is a pure dense flash-attention step, batched over the group's heads (batched
dots have no inter-head dependency, which keeps the MXU pipeline full — the
single-head variant measured only 62% MXU utilization from dependency stalls).

Mosaic constraints honored (probed on real TPU with a throwaway DMA probe):
  * box DMA offsets/sizes on the second-to-last dim (W) must be multiples of
    the 8-sublane tiling.  tile_w % 8 geometries (Wan 720p tile [5,9,8],
    Hunyuan [6,8,8]) read exact windows; misaligned tile_w reads an
    8-aligned superset box and masks the slack columns with a logits bias,
    with q/out travelling in tile-major layout (Mosaic also rejects
    non-8-aligned q blocks)
  * VMEM chunk reshape (hg, tt, th, ww, D) -> (hg, tt*th*ww, D) is free only
    when the merged sublane dim stays 8-aligned (ww = win_w*tile_w)

Small tiles amortize the per-grid-cell cost poorly; callers choose between
this kernel and the tiled pair-bits fallback via ``prefer_window_dense``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(-1e30)
LOG2E = 1.4426950408889634

Shape3 = Tuple[int, int, int]


def window_starts(latent_shape: Shape3, tile: Shape3, window: Shape3) -> np.ndarray:
    """(n_tiles, 3) int32 ELEMENT offsets of each q tile's clamped window box.

    Per axis: start_tile = clip(q_tile - win//2, 0, n - win_eff) with
    win_eff = min(win, n) — identical to geometry.sta_tile_mask clamping.
    """
    nt = tuple(latent_shape[i] // tile[i] for i in range(3))
    starts = np.zeros((nt[0] * nt[1] * nt[2], 3), np.int32)
    idx = 0
    for ti in range(nt[0]):
        for hi in range(nt[1]):
            for wi in range(nt[2]):
                for ax, q in enumerate((ti, hi, wi)):
                    win_eff = min(window[ax], nt[ax])
                    s = min(max(q - window[ax] // 2, 0), nt[ax] - win_eff)
                    starts[idx, ax] = s * tile[ax]
                idx += 1
    return starts


def _kernel(
    *refs,
    scale: float,
    tile: Shape3,
    win_eff: Shape3,  # effective window in tiles per axis
    hg: int,  # heads per grid cell
    q_mult: int,  # q tiles per grid cell along t (supertiling)
    h_sub: int,  # KV chunks per h-tile (shrinks VMEM scores when q_mult > 1)
    n_chains: int,  # interleaved independent softmax chains (1, 2, or 4)
    bw_pad: int,  # DMA w-span per chunk (== bw when tile_w is 8-aligned)
    w_limit: int,  # largest allowed aligned DMA w-start (clamps the box)
    q_raster: bool,  # q/out blocks carved from the raster 6-D view
    text_len: int,  # 0 = video-only; >0 adds a dense text-KV tail
    cast_p_to_v_dtype: bool,
):
    it = iter(refs)
    starts_ref = next(it)  # (n_tiles, 3) int32 element offsets, SMEM
    active_ref = next(it)  # (H,) int32
    q_ref = next(it)  # (1, hg, tt, th, tw, D)
    k_hbm = next(it)  # (B, H, T, Hh, W, D) raster
    v_hbm = next(it)
    tk_hbm = next(it) if text_len else None  # (B, H, Lt, D)
    tv_hbm = next(it) if text_len else None
    bias_ref = next(it) if text_len else None  # (1, Lt) f32 in VMEM
    out_ref = next(it)  # (1, hg, tt, th, tw, D)
    m_s = next(it)  # (n_chains, hg, tpt, 1) f32 — interleaved softmax chains
    l_s = next(it)
    acc_s = next(it)  # (2, hg, tpt, D) f32
    k_buf = next(it)  # (n_slots, hg, tt, th, bw, D)
    v_buf = next(it)
    if text_len:
        tk_buf = next(it)  # (hg, Lt, D)
        tv_buf = next(it)
        text_sems = next(it)  # (2,)
    dma_sems = next(it)  # (n_slots, 2)
    n_slots = k_buf.shape[0]
    b = pl.program_id(0)
    g = pl.program_id(1)
    i = pl.program_id(2)
    tt, th, tw = tile
    tpt = q_mult * tt * th * tw  # q rows per cell (q_mult t-tiles)
    d = q_ref.shape[-1]
    bw = win_eff[2] * tw  # whole w-window per chunk
    th_c = th // h_sub  # chunk h-rows
    n_chunks = win_eff[0] * win_eff[1] * h_sub

    t0 = starts_ref[i, 0]
    h0 = starts_ref[i, 1]
    if bw_pad == bw:
        # every w start is a multiple of 8 (tile_w % 8 == 0): box DMA reads
        # exactly the window, no masking
        wdma = pl.multiple_of(starts_ref[i, 2], 8)
        w_off = None
    else:
        # misaligned tile_w: read the 8-aligned superset [a0, a0 + bw_pad),
        # clamped so the box never overruns the latent width, and mask the
        # columns outside the true window with a logits bias
        w0 = starts_ref[i, 2]
        a0 = jnp.minimum(w0 - jax.lax.rem(w0, 8), w_limit)
        wdma = pl.multiple_of(a0, 8)
        w_off = w0 - wdma
    # skip cells whose whole head group is inactive (callers pack routed
    # heads first, so inactive groups are contiguous at the end)
    group_any = active_ref[g * hg]
    for hi in range(1, hg):
        group_any = group_any | active_ref[g * hg + hi]

    def chunk_dma(slot, j):
        dt = j // (win_eff[1] * h_sub)
        rem = j - dt * (win_eff[1] * h_sub)
        dh = rem // h_sub
        hs = rem - dh * h_sub
        hoff = h0 + dh * th + hs * th_c
        k_copy = pltpu.make_async_copy(
            k_hbm.at[
                b, pl.ds(g * hg, hg),
                pl.ds(t0 + dt * tt, tt), pl.ds(hoff, th_c),
                pl.ds(wdma, bw_pad), :,
            ],
            k_buf.at[slot],
            dma_sems.at[slot, 0],
        )
        v_copy = pltpu.make_async_copy(
            v_hbm.at[
                b, pl.ds(g * hg, hg),
                pl.ds(t0 + dt * tt, tt), pl.ds(hoff, th_c),
                pl.ds(wdma, bw_pad), :,
            ],
            v_buf.at[slot],
            dma_sems.at[slot, 1],
        )
        return k_copy, v_copy

    m_s[...] = jnp.full_like(m_s, NEG_INF)
    l_s[...] = jnp.zeros_like(l_s)
    acc_s[...] = jnp.zeros_like(acc_s)

    @pl.when(group_any > 0)
    def _run():
        if text_len:
            # text K/V streamed once per cell, overlapped with the window loop
            tkc = pltpu.make_async_copy(
                tk_hbm.at[b, pl.ds(g * hg, hg), :, :], tk_buf, text_sems.at[0]
            )
            tvc = pltpu.make_async_copy(
                tv_hbm.at[b, pl.ds(g * hg, hg), :, :], tv_buf, text_sems.at[1]
            )
            tkc.start()
            tvc.start()
        for j in range(min(n_slots, n_chunks)):
            kc, vc = chunk_dma(j, j)
            kc.start()
            vc.start()

        if q_raster:
            q = q_ref[0].reshape(hg, tpt, d)  # free: tw % 8 == 0
        else:
            # tile-major q layout (misaligned tile_w): block is already
            # (hg, tpt, d) — no reshape, no alignment constraint
            q = q_ref[0, :, 0]
        n_cols = tt * th_c * bw_pad
        col_bias = None
        if w_off is not None:
            colw = jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, (1, n_cols), 1), bw_pad
            )
            col_bias = jnp.where(
                (colw >= w_off) & (colw < w_off + bw), 0.0, NEG_INF
            )  # (1, n_cols) f32, shared by every chunk of this cell

        def qk(j):
            slot = jax.lax.rem(j, n_slots)
            kc, vc = chunk_dma(slot, j)
            kc.wait()
            vc.wait()
            k = k_buf[slot].reshape(hg, n_cols, d)
            s = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (hg, tpt, N)
            s = s * (scale * LOG2E)
            if col_bias is not None:
                s = s + col_bias[None]
            return s, slot

        def soft_pv(chain, s, slot):
            """Online-softmax update of chain ``chain`` with scores ``s``."""
            m_prev = m_s[chain]
            l_prev = l_s[chain]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m_prev - m_new)
            l_s[chain] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            m_s[chain] = m_new
            v = v_buf[slot].reshape(hg, n_cols, d)
            if cast_p_to_v_dtype and v.dtype != jnp.float32:
                p = p.astype(v.dtype)
            acc_s[chain] = acc_s[chain] * alpha + jax.lax.dot_general(
                p, v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

        # Chunk groups feed ``n_chains`` independent (m, l, acc) chains so
        # one chunk's q@k (MXU) has no dependency on another's softmax
        # (VPU): the scheduler overlaps them instead of serializing
        # MXU -> VPU -> MXU per chunk (the round-1 bottleneck: 62% MXU
        # util).  Big supertiled cells (where the live f32 score matrices
        # would blow scoped VMEM) drop to a single chain.
        def group_body(jg, _):
            j0 = n_chains * jg
            ss = [qk(j0 + c) for c in range(n_chains)]
            for c, (s_c, slot_c) in enumerate(ss):
                soft_pv(c, s_c, slot_c)

            # refill the slots just consumed (prefetch distance n_slots;
            # issued only after both reads of the slot, so no overwrite race)
            for c in range(n_chains):
                j = j0 + c

                @pl.when(j + n_slots < n_chunks)
                def _prefetch():
                    kc, vc = chunk_dma(
                        jax.lax.rem(j + n_slots, n_slots), j + n_slots
                    )
                    kc.start()
                    vc.start()

            return 0

        jax.lax.fori_loop(0, n_chunks // n_chains, group_body, 0)
        for j in range(n_chunks - n_chunks % n_chains, n_chunks):
            s_c, slot_c = qk(j)
            soft_pv(j % n_chains, s_c, slot_c)

        # merge all chains into chain 0 (standard flash partials combine)
        for c in range(1, n_chains):
            m_a, m_b = m_s[0], m_s[c]
            m_new = jnp.maximum(m_a, m_b)
            a_a = jnp.exp2(m_a - m_new)
            a_b = jnp.exp2(m_b - m_new)
            m_s[0] = m_new
            l_s[0] = l_s[0] * a_a + l_s[c] * a_b
            acc_s[0] = acc_s[0] * a_a + acc_s[c] * a_b

        if text_len:
            # dense text tail: every video query sees all (unpadded) text
            tkc = pltpu.make_async_copy(
                tk_hbm.at[b, pl.ds(g * hg, hg), :, :], tk_buf, text_sems.at[0]
            )
            tvc = pltpu.make_async_copy(
                tv_hbm.at[b, pl.ds(g * hg, hg), :, :], tv_buf, text_sems.at[1]
            )
            tkc.wait()
            tvc.wait()
            kt = tk_buf[...]
            vt = tv_buf[...]
            s = jax.lax.dot_general(
                q, kt,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            s = s * (scale * LOG2E) + bias_ref[0][None, None, :]
            m_prev = m_s[0]
            l_prev = l_s[0]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m_prev - m_new)
            l_s[0] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            m_s[0] = m_new
            if cast_p_to_v_dtype and vt.dtype != jnp.float32:
                p = p.astype(vt.dtype)
            acc_s[0] = acc_s[0] * alpha + jax.lax.dot_general(
                p, vt,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

    l = l_s[0]
    out = acc_s[0] / jnp.where(l == 0.0, 1.0, l)
    # zero non-routed heads (SMEM scalar loads only -> static per-head loop)
    for hi in range(hg):
        a = (active_ref[g * hg + hi] > 0).astype(jnp.float32)
        if q_raster:
            out_ref[0, hi] = (
                (out[hi] * a).reshape(out_ref.shape[2:]).astype(out_ref.dtype)
            )
        else:
            out_ref[0, hi, 0] = (out[hi] * a).astype(out_ref.dtype)


def supports_window_dense(latent_shape: Shape3, tile: Shape3) -> bool:
    """Box-DMA constraint for this geometry: tiles must divide the grid.

    tile_w need not be 8-aligned any more: misaligned windows read an
    8-aligned superset box and mask the slack columns with a logits bias
    (the reference 480p geometry, tile [4, 6, 4], takes this path)."""
    t, h, w = latent_shape
    tt, th, tw = tile
    if t % tt or h % th or w % tw:
        return False
    # misaligned path carves q/out blocks at tile granularity
    return tw % 8 == 0 or (tt * th * tw) % 8 == 0


def prefer_window_dense(latent_shape: Shape3, tile: Shape3) -> bool:
    """Kernel choice heuristic for routed/joint STA callers.

    The window-dense kernel runs one grid cell per q tile; with small tiles
    the per-cell overhead dominates (Wan 480p, 96-token tiles: 1.24x e2e vs
    the tiled pair-bits fallback's 1.27x).  Use it only when tiles are big
    enough to amortize the cell (>= 192 tokens; Wan 720p has 360, Hunyuan
    720p has 384)."""
    tt, th, tw = tile
    return supports_window_dense(latent_shape, tile) and tt * th * tw >= 192


def _heads_per_cell(h: int, tpt: int, bw_chunk: int, d: int, itemsize: int) -> int:
    """Heads per grid cell.  Measured on v5e: batching heads does NOT improve
    throughput (the per-chunk MXU->VPU->MXU dependency chain dominates either
    way), while hg=1 gives per-HEAD skip granularity for routing — inactive
    heads cost one empty grid cell instead of a third of a group.  Keep 1."""
    return 1


def sta_window_attention(
    q: jax.Array,  # (B, H, S, D) RASTER order
    k: jax.Array,
    v: jax.Array,
    active: jax.Array,  # (H,) bool/int — heads routed to STA
    *,
    latent_shape: Shape3,
    tile: Shape3,
    window: Shape3 = (3, 3, 3),
    scale: Optional[float] = None,
    text_k: Optional[jax.Array] = None,  # (B, H, Lt, D) joint-attention tail
    text_v: Optional[jax.Array] = None,
    text_bias: Optional[jax.Array] = None,  # (1, Lt) or (Lt,) f32 additive
    cast_p_to_v_dtype: bool = True,
    interpret: bool = False,
    _force: Optional[Tuple[int, int, int]] = None,  # test hook: (q_mult, h_sub, n_chains)
) -> jax.Array:
    """Sliding-tile attention over raster-order inputs; inactive heads output
    zeros (participation-mask contract of ops/routed_fused).

    With ``text_k/text_v`` set (Hunyuan joint attention), every video query
    additionally attends densely to the text tokens, with ``text_bias``
    carrying the per-prompt padding mask (-1e30 on padded positions) —
    reference: vorta/attention/hunyuan.py joint STA.  Only the VIDEO rows are
    computed here; text-query rows are dense over the whole joint sequence
    and are handled by the caller (ops/joint_experts)."""
    b, n_heads, s, d = q.shape
    t, hh, w = latent_shape
    if s != t * hh * w:
        raise ValueError(f"seq len {s} != prod(latent_shape) {latent_shape}")
    if not supports_window_dense(latent_shape, tile):
        raise ValueError(
            f"geometry (latent {latent_shape}, tile {tile}) unsupported: "
            "tiles must divide the latent grid"
        )
    if d % 128 and not interpret:
        raise ValueError(f"head_dim {d} must be a multiple of 128 on TPU")
    if scale is None:
        scale = d**-0.5
    tt, th, tw = tile
    nt, nh, nw = t // tt, hh // th, w // tw
    n_tiles = nt * nh * nw
    win_eff = (min(window[0], nt), min(window[1], nh), min(window[2], nw))
    bw = win_eff[2] * tw
    tpt = tt * th * tw
    hg = _heads_per_cell(n_heads, tpt, tt * th * bw, d, q.dtype.itemsize)
    n_groups = n_heads // hg

    starts_np = window_starts(latent_shape, tile, window)
    # t-supertiling: when adjacent t-tile pairs have IDENTICAL clamped
    # windows (e.g. Wan 720p: nt=4, win=3 -> starts 0,0,1,1), one grid cell
    # serves both q tiles — the shared KV window is fetched once (halves the
    # dominant DMA traffic) and the q rows double (fuller MXU).  Exact: the
    # visited KV set per q row is unchanged.
    st_t = [
        min(max(ti - window[0] // 2, 0), nt - win_eff[0]) for ti in range(nt)
    ]

    bw_est = bw if tw % 8 == 0 else -(-(bw + 7) // 8) * 8

    def vmem_est(qm, hs, chains):
        th_c = th // hs
        chunk = tt * th_c * bw_est
        return (
            3 * chains * qm * tpt * chunk * 2  # live f32 scores (x1.5 margin)
            + qm * tpt * chunk * 2             # bf16 p copy
            + 4 * chunk * d * 2 * 2            # 4-slot k+v buffers
            + 2 * qm * tpt * d * 4             # two acc chains
            + 4 * qm * tpt * d * 2             # q/out double buffers
        )

    pairable = tw % 8 == 0 and nt % 2 == 0 and all(
        st_t[2 * i] == st_t[2 * i + 1] for i in range(nt // 2)
    )
    # prefer doubled q rows (halves KV DMA, fuller MXU); shrink the KV chunk
    # (h_sub) until the two live score matrices fit scoped VMEM
    h_divs = [x for x in range(1, th + 1) if th % x == 0]
    budget = 12 * 2**20
    # Preference (measured at Wan 720p, all-heads): plain two-chain 49.7 ms;
    # t-supertiled single-chain 50.7 ms; supertiled two-chain w/ shrunken
    # chunks 61.3 ms — the kernel is softmax-chain-bound, not DMA-bound, so
    # halving KV traffic does not pay for losing the MXU/VPU interleave.
    # More chains interleave deeper as long as the live score matrices fit.
    # Supertiling + h_sub remain as VMEM fallbacks for fat geometries.
    # chains beyond 2 measured flat (4-chain: 50.6 ms vs 2-chain 49.7 at Wan
    # 720p) — two suffice to cover the VPU softmax with MXU work
    q_mult, h_sub, n_chains = 1, 1, 1
    if vmem_est(1, 1, 2) < budget:
        n_chains = 2
    if n_chains == 1:
        if pairable and vmem_est(2, 1, 1) < budget:
            q_mult = 2
        else:
            for hs in h_divs:
                if vmem_est(1, hs, 2) < budget:
                    h_sub, n_chains = hs, 2
                    break
    if _force is not None:
        # test hook: pin the (q_mult, h_sub, n_chains) selection so the VMEM
        # fallback paths are exercised at CI geometries (they otherwise only
        # engage on fat real-hardware shapes)
        q_mult, h_sub, n_chains = _force
        if q_mult == 2 and not pairable:
            raise ValueError("q_mult=2 requires t-pairable window starts")
        if th % h_sub:
            raise ValueError(f"h_sub {h_sub} must divide tile_h {th}")
    if q_mult == 2:
        starts_np = starts_np.reshape(nt, nh, nw, 3)[::2].reshape(-1, 3)
        n_tiles //= 2
        nt //= 2
    starts = jnp.asarray(starts_np)
    q6 = q.reshape(b, n_heads, t, hh, w, d)
    k6 = k.reshape(b, n_heads, t, hh, w, d)
    v6 = v.reshape(b, n_heads, t, hh, w, d)
    if tw % 8 == 0:
        bw_pad = bw
        w_limit = max(0, ((w - bw) // 8) * 8)
    else:
        # w starts are multiples of tile_w; DMA from the aligned floor,
        # spanning enough 8-columns to cover the worst-case offset, with the
        # box start CLAMPED to keep it inside the latent width (growing the
        # span when the clamp widens an offset).  When W itself is not
        # 8-aligned the right-edge window has no reachable in-bounds aligned
        # start, the loop runs down to w_limit < 0, and K/V are padded once
        # instead — acceptable: misaligned-tile_w geometries prefer the
        # tiled fallback kernel (prefer_window_dense) in the first place.
        w_starts = starts_np[:, 2]
        offs = w_starts % 8
        bw_pad = -(-(int(offs.max()) + bw) // 8) * 8
        while True:
            w_limit = ((w - bw_pad) // 8) * 8
            if w_limit < 0:
                # whole latent width smaller than one padded window span
                # (toy grids only): pad K/V once instead of clamping
                pad = [(0, 0)] * 6
                pad[4] = (0, bw_pad - w)
                k6 = jnp.pad(k6, pad)
                v6 = jnp.pad(v6, pad)
                w_limit = 0
                break
            clamped = np.minimum(w_starts - offs, w_limit)
            if int((w_starts - clamped).max()) + bw <= bw_pad:
                break
            bw_pad += 8
    text_len = 0
    if text_k is not None:
        text_len = text_k.shape[2]
        if text_len % 8 and not interpret:
            raise ValueError(f"text_len {text_len} must be a multiple of 8")
        if text_bias is None:
            text_bias = jnp.zeros((1, text_len), jnp.float32)
        text_bias = text_bias.astype(jnp.float32).reshape(1, text_len)

    q_raster = tw % 8 == 0
    kernel = functools.partial(
        _kernel,
        scale=float(scale),
        tile=tile,
        win_eff=win_eff,
        hg=hg,
        q_mult=q_mult,
        h_sub=h_sub,
        n_chains=n_chains,
        bw_pad=bw_pad,
        w_limit=w_limit,
        q_raster=q_raster,
        text_len=text_len,
        cast_p_to_v_dtype=cast_p_to_v_dtype,
    )

    def q_map(bb, gg, ii, *refs):
        ti = ii // (nh * nw)
        rem = ii - ti * (nh * nw)
        hi = rem // nw
        wi = rem - hi * nw
        return (bb, gg, ti, hi, wi, 0)

    if q_raster:
        q_spec = pl.BlockSpec((1, hg, q_mult * tt, th, tw, d), q_map)
        q_in = q6
    else:
        # misaligned tile_w: Mosaic rejects w-blocks that are not 8-aligned,
        # so q/out travel in tile-major layout (two small relayouts of q and
        # out only — K/V stay raster and relayout-free)
        from .layout import tile_sequence

        q_in = tile_sequence(q, latent_shape, tile).reshape(
            b, n_heads, n_tiles, tpt, d
        )
        q_spec = pl.BlockSpec(
            (1, hg, 1, tpt, d), lambda bb, gg, ii, *r: (bb, gg, ii, 0, 0)
        )

    in_specs = [
        q_spec,
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [q_in, k6, v6]
    n_chunks_total = win_eff[0] * win_eff[1] * h_sub
    n_slots = min(4, max(2, n_chunks_total))
    tpt_q = q_mult * tpt
    th_c = th // h_sub
    scratch = [
        pltpu.VMEM((n_chains, hg, tpt_q, 1), jnp.float32),
        pltpu.VMEM((n_chains, hg, tpt_q, 1), jnp.float32),
        pltpu.VMEM((n_chains, hg, tpt_q, d), jnp.float32),
        pltpu.VMEM((n_slots, hg, tt, th_c, bw_pad, d), k.dtype),
        pltpu.VMEM((n_slots, hg, tt, th_c, bw_pad, d), v.dtype),
    ]
    if text_len:
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, text_len), lambda bb, gg, ii, *r: (0, 0)),
        ]
        inputs += [text_k, text_v, text_bias]
        scratch += [
            pltpu.VMEM((hg, text_len, d), text_k.dtype),
            pltpu.VMEM((hg, text_len, d), text_v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    scratch.append(pltpu.SemaphoreType.DMA((n_slots, 2)))
    if q_raster:
        out_spec = pl.BlockSpec((1, hg, q_mult * tt, th, tw, d), q_map)
        out_shape = jax.ShapeDtypeStruct(q6.shape, q.dtype)
    else:
        out_spec = pl.BlockSpec(
            (1, hg, 1, tpt, d), lambda bb, gg, ii, *r: (bb, gg, ii, 0, 0)
        )
        out_shape = jax.ShapeDtypeStruct((b, n_heads, n_tiles, tpt, d), q.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_groups, n_tiles),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
    )
    n_chunks = n_chunks_total
    out6 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(b * n_heads * n_tiles * n_chunks * 4 * tpt_q * tt * th * bw * d),
            bytes_accessed=int(q.size * q.dtype.itemsize * 3),
            transcendentals=int(b * n_heads * s * (n_chunks + (1 if text_len else 0))),
        ),
        interpret=interpret,
    )(starts, active.astype(jnp.int32), *inputs)
    if not q_raster:
        from .layout import untile_sequence

        return untile_sequence(
            out6.reshape(b, n_heads, s, d), latent_shape, tile
        )
    return out6.reshape(b, n_heads, s, d)
