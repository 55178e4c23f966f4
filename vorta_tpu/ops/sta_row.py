"""Row-dense sliding-tile attention (kernel v5 — shared whole-width slabs).

tools/sta_diag.py showed kernel v4 (ops/sta_window.py) is DMA-bound: per-tile
window boxes are 6KB-run strided copies reaching ~445 GB/s, re-fetched for
every overlapping q tile — 12 GB per block at Wan 720p, 27 of its 46.5 ms.

This kernel processes one grid cell per (batch, head, t-tile, h-tile) — an
entire W-row of q tiles at once.  All q tiles in the row share the same
(t, h) window tiles (those depend only on the row), so the cell streams
win_t*win_h chunks of shape (tile_t, tile_h, W, D): full-width slabs whose
rows are (tile_h * W * D) CONTIGUOUS bytes (~184KB runs at 720p, near-peak
DMA) fetched ONCE for the whole row — 6x fewer KV bytes AND longer runs.
Per chunk, each q tile takes its (static!) w-window slice of the resident
slab: every w-start is a Python constant (clip(wi - win//2, 0, nw - win)),
so there is no masking and no dynamic slicing anywhere.

Each q tile keeps its own online-softmax state; interleaving the per-tile
(dot -> softmax -> pv) streams across the row gives the MXU independent work
during every softmax for free (nw-way, vs the 2-chain interleave of v4).

Joint (Hunyuan) text tails attach exactly as in v4: text K/V stream once per
cell and every video query row attends densely to them with the padding
bias.  Reference semantics: vorta/attention/sliding_attn_flex.py:101-134
(center-clamped tile-granular window).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sta_window import window_starts

NEG_INF = float(-1e30)
LOG2E = 1.4426950408889634

Shape3 = Tuple[int, int, int]


def _row_starts(latent_shape: Shape3, tile: Shape3, window: Shape3) -> np.ndarray:
    """(nt*nh, 2) int32 ELEMENT offsets (t0, h0) of each row's clamped window
    box — row (ti, hi) shares the (t, h) starts of all its w tiles, so this
    is the shared window_starts table subsampled at wi == 0."""
    t, hh, w = latent_shape
    nt, nh, nw = t // tile[0], hh // tile[1], w // tile[2]
    full = window_starts(latent_shape, tile, window).reshape(nt, nh, nw, 3)
    return np.ascontiguousarray(full[:, :, 0, :2].reshape(nt * nh, 2))


def _w_window_starts(latent_shape: Shape3, tile: Shape3, window: Shape3):
    """Static per-w-tile element start of the clamped w window (column 2 of
    the shared window_starts table, identical for every (t, h) row)."""
    t, hh, w = latent_shape
    nt, nh, nw = t // tile[0], hh // tile[1], w // tile[2]
    full = window_starts(latent_shape, tile, window).reshape(nt, nh, nw, 3)
    return [int(x) for x in full[0, 0, :, 2]]


def _kernel(
    *refs,
    scale: float,
    tile: Shape3,
    win_eff: Shape3,
    latent_w: int,
    nw: int,
    w_starts: Tuple[int, ...],  # static element starts per w tile
    text_len: int,
    cast_p_to_v_dtype: bool,
):
    it = iter(refs)
    starts_ref = next(it)  # (nt*nh, 2) SMEM
    active_ref = next(it)  # (H,) int32
    q_ref = next(it)  # (1, 1, tt, th, W, D)
    k_hbm = next(it)  # (B, H, T, Hh, W, D)
    v_hbm = next(it)
    tk_hbm = next(it) if text_len else None  # (B, H, Lt, D)
    tv_hbm = next(it) if text_len else None
    bias_ref = next(it) if text_len else None  # (1, Lt) f32
    out_ref = next(it)  # (1, 1, tt, th, W, D)
    m_s = next(it)  # (nw, tpt, 1) f32 — one softmax state per w q-tile
    l_s = next(it)
    acc_s = next(it)  # (nw, tpt, D) f32
    k_buf = next(it)  # (n_slots, tt, th, W, D)
    v_buf = next(it)
    if text_len:
        tk_buf = next(it)  # (Lt, D)
        tv_buf = next(it)
        text_sems = next(it)
    dma_sems = next(it)  # (n_slots, 2)
    n_slots = k_buf.shape[0]
    b = pl.program_id(0)
    g = pl.program_id(1)
    i = pl.program_id(2)
    tt, th, tw = tile
    tpt = tt * th * tw
    d = q_ref.shape[-1]
    bw = win_eff[2] * tw
    n_chunks = win_eff[0] * win_eff[1]

    t0 = starts_ref[i, 0]
    h0 = starts_ref[i, 1]
    alive = active_ref[g] > 0

    def chunk_dma(slot, j):
        dt = j // win_eff[1]
        dh = j - dt * win_eff[1]
        kc = pltpu.make_async_copy(
            k_hbm.at[b, g, pl.ds(t0 + dt * tt, tt), pl.ds(h0 + dh * th, th), :, :],
            k_buf.at[slot],
            dma_sems.at[slot, 0],
        )
        vc = pltpu.make_async_copy(
            v_hbm.at[b, g, pl.ds(t0 + dt * tt, tt), pl.ds(h0 + dh * th, th), :, :],
            v_buf.at[slot],
            dma_sems.at[slot, 1],
        )
        return kc, vc

    m_s[...] = jnp.full_like(m_s, NEG_INF)
    l_s[...] = jnp.zeros_like(l_s)
    acc_s[...] = jnp.zeros_like(acc_s)

    @pl.when(alive)
    def _run():
        if text_len:
            tkc = pltpu.make_async_copy(tk_hbm.at[b, g, :, :], tk_buf, text_sems.at[0])
            tvc = pltpu.make_async_copy(tv_hbm.at[b, g, :, :], tv_buf, text_sems.at[1])
            tkc.start()
            tvc.start()
        for j in range(min(n_slots, n_chunks)):
            kc, vc = chunk_dma(j, j)
            kc.start()
            vc.start()

        # all of the row's q, viewed per w tile (static slices)
        q_row = q_ref[0, 0]  # (tt, th, W, D)
        qs = [
            q_row[:, :, wi * tw : (wi + 1) * tw, :].reshape(tpt, d)
            for wi in range(nw)
        ]

        def soft_pv(wi, s, v_wi):
            m_prev = m_s[wi]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m_prev - m_new)
            l_s[wi] = l_s[wi] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            m_s[wi] = m_new
            if cast_p_to_v_dtype and v_wi.dtype != jnp.float32:
                p = p.astype(v_wi.dtype)
            acc_s[wi] = acc_s[wi] * alpha + jax.lax.dot_general(
                p, v_wi,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def body(j, _):
            slot = jax.lax.rem(j, n_slots)
            kc, vc = chunk_dma(slot, j)
            kc.wait()
            vc.wait()
            k_chunk = k_buf[slot]
            v_chunk = v_buf[slot]
            # nw independent (dot, softmax, pv) streams: the next tile's q@k
            # (MXU) never depends on the previous tile's softmax (VPU)
            for wi in range(nw):
                ws = w_starts[wi]
                k_wi = k_chunk[:, :, ws : ws + bw, :].reshape(tt * th * bw, d)
                s = jax.lax.dot_general(
                    qs[wi], k_wi,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * (scale * LOG2E)
                v_wi = v_chunk[:, :, ws : ws + bw, :].reshape(tt * th * bw, d)
                soft_pv(wi, s, v_wi)

            @pl.when(j + n_slots < n_chunks)
            def _prefetch():
                kc, vc = chunk_dma(jax.lax.rem(j + n_slots, n_slots), j + n_slots)
                kc.start()
                vc.start()

            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

        if text_len:
            tkc = pltpu.make_async_copy(tk_hbm.at[b, g, :, :], tk_buf, text_sems.at[0])
            tvc = pltpu.make_async_copy(tv_hbm.at[b, g, :, :], tv_buf, text_sems.at[1])
            tkc.wait()
            tvc.wait()
            kt = tk_buf[...]
            vt = tv_buf[...]
            for wi in range(nw):
                s = jax.lax.dot_general(
                    qs[wi], kt,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * (scale * LOG2E) + bias_ref[0][None, :]
                if cast_p_to_v_dtype:
                    m_prev = m_s[wi]
                    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
                    p = jnp.exp2(s - m_new).astype(vt.dtype)
                    alpha = jnp.exp2(m_prev - m_new)
                else:
                    m_prev = m_s[wi]
                    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
                    p = jnp.exp2(s - m_new)
                    alpha = jnp.exp2(m_prev - m_new)
                l_s[wi] = l_s[wi] * alpha + jnp.sum(
                    p.astype(jnp.float32), axis=-1, keepdims=True)
                m_s[wi] = m_new
                acc_s[wi] = acc_s[wi] * alpha + jax.lax.dot_general(
                    p, vt,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

    a = (active_ref[g] > 0).astype(jnp.float32)
    for wi in range(nw):
        l = l_s[wi]
        out = acc_s[wi] / jnp.where(l == 0.0, 1.0, l)
        out_ref[0, 0, :, :, wi * tw : (wi + 1) * tw, :] = (
            (out * a).reshape(tt, th, tw, d).astype(out_ref.dtype)
        )


def supports_row_dense(latent_shape: Shape3, tile: Shape3, d: int,
                      itemsize: int = 2, text_len: int = 0,
                      window: Shape3 = (3, 3, 3)) -> bool:
    """Eligibility: tiles divide the grid, tile_w 8-aligned (free reshapes of
    W slices), and the VMEM working set fits the scoped budget."""
    t, hh, w = latent_shape
    tt, th, tw = tile
    if t % tt or hh % th or w % tw:
        return False
    if tw % 8:
        return False
    nw = w // tw
    tpt = tt * th * tw
    slab = tt * th * w * d * itemsize
    bw = min(window[2], nw) * tw  # effective w window span
    est = (
        2 * 2 * slab                       # 2-slot k+v chunk buffers
        + 2 * 2 * slab                     # q/out double-buffered blocks
        + nw * tpt * (d + 2) * 4           # per-tile acc/m/l states
        + 3 * tpt * tt * th * bw * 4       # live f32 scores (x3 margin)
        + 2 * text_len * d * itemsize
    )
    return est < 40 * 2**20  # vmem_limit_bytes raised to 64MB for this kernel


def sta_row_attention(
    q: jax.Array,  # (B, H, S, D) raster
    k: jax.Array,
    v: jax.Array,
    active: jax.Array,  # (H,)
    *,
    latent_shape: Shape3,
    tile: Shape3,
    window: Shape3 = (3, 3, 3),
    scale: Optional[float] = None,
    text_k: Optional[jax.Array] = None,
    text_v: Optional[jax.Array] = None,
    text_bias: Optional[jax.Array] = None,
    cast_p_to_v_dtype: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Same contract as ops.sta_window.sta_window_attention."""
    b, n_heads, s, d = q.shape
    t, hh, w = latent_shape
    if s != t * hh * w:
        raise ValueError(f"seq len {s} != prod(latent_shape) {latent_shape}")
    tt, th, tw = tile
    if not supports_row_dense(latent_shape, tile, d, q.dtype.itemsize,
                              0 if text_k is None else text_k.shape[2],
                              window=window):
        raise ValueError(f"geometry (latent {latent_shape}, tile {tile}) "
                         "not eligible for the row-dense kernel")
    if d % 128 and not interpret:
        raise ValueError(f"head_dim {d} must be a multiple of 128 on TPU")
    if scale is None:
        scale = d**-0.5
    nt, nh, nw = t // tt, hh // th, w // tw
    win_eff = (min(window[0], nt), min(window[1], nh), min(window[2], nw))
    w_starts = _w_window_starts(latent_shape, tile, window)
    tpt = tt * th * tw
    n_rows = nt * nh
    n_chunks = win_eff[0] * win_eff[1]
    n_slots = min(2, n_chunks)

    starts = jnp.asarray(_row_starts(latent_shape, tile, window))
    q6 = q.reshape(b, n_heads, t, hh, w, d)
    k6 = k.reshape(b, n_heads, t, hh, w, d)
    v6 = v.reshape(b, n_heads, t, hh, w, d)
    text_len = 0
    if text_k is not None:
        text_len = text_k.shape[2]
        if text_len % 8 and not interpret:
            raise ValueError(f"text_len {text_len} must be a multiple of 8")
        if text_bias is None:
            text_bias = jnp.zeros((1, text_len), jnp.float32)
        text_bias = text_bias.astype(jnp.float32).reshape(1, text_len)

    kernel = functools.partial(
        _kernel,
        scale=float(scale),
        tile=tile,
        win_eff=win_eff,
        latent_w=w,
        nw=nw,
        w_starts=tuple(w_starts),
        text_len=text_len,
        cast_p_to_v_dtype=cast_p_to_v_dtype,
    )

    def q_map(bb, gg, ii, *refs):
        return (bb, gg, ii // nh, ii - (ii // nh) * nh, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, tt, th, w, d), q_map),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [q6, k6, v6]
    scratch = [
        pltpu.VMEM((nw, tpt, 1), jnp.float32),
        pltpu.VMEM((nw, tpt, 1), jnp.float32),
        pltpu.VMEM((nw, tpt, d), jnp.float32),
        pltpu.VMEM((n_slots, tt, th, w, d), k.dtype),
        pltpu.VMEM((n_slots, tt, th, w, d), v.dtype),
    ]
    if text_len:
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, text_len), lambda bb, gg, ii, *r: (0, 0)),
        ]
        inputs += [text_k, text_v, text_bias]
        scratch += [
            pltpu.VMEM((text_len, d), text_k.dtype),
            pltpu.VMEM((text_len, d), text_v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    scratch.append(pltpu.SemaphoreType.DMA((n_slots, 2)))
    out6 = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, n_heads, n_rows),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, tt, th, w, d), q_map),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct(q6.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=64 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(b * n_heads * n_rows * n_chunks * nw * 4
                      * tpt * tt * th * win_eff[2] * tw * d),
            bytes_accessed=int(q.size * q.dtype.itemsize * 3),
            transcendentals=int(b * n_heads * s * (n_chunks + (1 if text_len else 0))),
        ),
        interpret=interpret,
    )(starts, active.astype(jnp.int32), *inputs)
    return out6.reshape(b, n_heads, s, d)
