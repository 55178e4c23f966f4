"""Grid-pipelined row-dense sliding-tile attention (kernel v6).

Kernel v5 (ops/sta_row.py) fetches each row's window slabs with *manual*
in-kernel DMAs; tools/sta_diag.py bisection showed Mosaic serializes those
waits against compute (total = DMA + MXU, no overlap, 45.3 ms at Wan 720p vs
a ~22 ms MXU floor).  BlockSpec-managed transfers, by contrast, ride the
Pallas grid pipeline and DO overlap with compute (ops/flash.py reaches 69%
of MXU peak this way).

This kernel keeps v5's compute body — one grid cell is one (batch, head,
t-tile, h-tile) row of q tiles, streaming the win_t*win_h full-width KV
slabs whose (t, h) starts are shared by the whole row — but the slab fetch
becomes a *grid dimension*: grid (B, H, n_rows, n_chunks) with the K/V
BlockSpec index maps reading the row's clamped window start (in tile units,
so starts are exact block indices) from a scalar-prefetched table.  The
pipeline double-buffers the next chunk's slabs during the current chunk's
dots, which is precisely the overlap the manual-DMA kernels never got.

Per chunk, each of the row's nw q tiles takes its static w-window slice of
the resident slab (every w-start is a Python constant) and runs one online
softmax step; the nw independent (dot -> softmax -> pv) streams keep the
MXU busy during every VPU softmax.  Joint (Hunyuan) text tails stream once
per (batch, head) as constant-index blocks and are folded in on the last
chunk with the padding bias.

Reference semantics: vorta/attention/sliding_attn_flex.py:101-134
(center-clamped tile-granular window; tile re-layout + compiled
flex-attention block-sparse kernel).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sta_row import _row_starts, _w_window_starts

NEG_INF = float(-1e30)
LOG2E = 1.4426950408889634

Shape3 = Tuple[int, int, int]


def _q_mult(latent_shape: Shape3, tile: Shape3, window: Shape3) -> int:
    """q-supertile factor along t: 2 when consecutive t-tile row pairs share
    the same clamped t window start (e.g. Wan 720p nt=4, win 3 -> starts
    [0,0,1,1]), so one grid cell can process both rows against one slab
    stream — doubling the dot M dim and halving cells, DMA, and transposes."""
    t, hh, w = latent_shape
    nt, nh = t // tile[0], hh // tile[1]
    if nt % 2:
        return 1
    starts = _row_starts(latent_shape, tile, window).reshape(nt, nh, 2)
    for r in range(0, nt, 2):
        if not (starts[r] == starts[r + 1]).all():
            return 1
    return 2


def _w_groups(latent_shape: Shape3, tile: Shape3, window: Shape3):
    """Geometry of the grouped-width variant (tile_w divides 8 but is not a
    multiple of 8): q streams in 8-token w groups over a w axis zero-padded
    to ``w_pad``; each group's KV slice is the union of its tiles' clamped
    windows rounded out to 8-token boundaries, one uniform ``bw8`` wide.

    Returns (w_pad, n_groups, bw8, los) with ``los`` the per-group 8-aligned
    KV slice starts (los[g] + bw8 <= w_pad always)."""
    t, hh, w = latent_shape
    tt, th, tw = tile
    nw = w // tw
    win_w = min(window[2], nw)
    bw_tok = win_w * tw
    w_starts = _w_window_starts(latent_shape, tile, window)
    w_pad = ((w + 7) // 8) * 8
    n_groups = w_pad // 8
    spans = []
    for gi in range(n_groups):
        t0 = (gi * 8) // tw
        t1 = min(nw - 1, (gi * 8 + 7) // tw)
        ws = [w_starts[x] for x in range(t0, t1 + 1)]
        lo = (min(ws) // 8) * 8
        hi = -(-(max(ws) + bw_tok) // 8) * 8
        spans.append((lo, hi))
    bw8 = min(max(hi - lo for lo, hi in spans), w_pad)
    los = tuple(max(0, min(lo, w_pad - bw8)) for lo, _ in spans)
    return w_pad, n_groups, bw8, los


def _w_group_bias(latent_shape: Shape3, tile: Shape3, window: Shape3):
    """(n_groups*8, tt*th*bw8) f32 additive bias for the grouped variant:
    0 where the kv w-position lies inside the q token's clamped w window
    (and inside the real, unpadded w extent), NEG_INF otherwise."""
    t, hh, w = latent_shape
    tt, th, tw = tile
    nw = w // tw
    win_w = min(window[2], nw)
    bw_tok = win_w * tw
    w_starts = np.asarray(_w_window_starts(latent_shape, tile, window))
    w_pad, n_groups, bw8, los = _w_groups(latent_shape, tile, window)
    bias = np.full((n_groups * 8, tt * th * bw8), NEG_INF, np.float32)
    for gi in range(n_groups):
        lo = los[gi]
        for wj in range(8):
            qw = gi * 8 + wj
            if qw >= w:
                continue  # padded q row: fully masked (out row sliced off)
            ws_q = w_starts[qw // tw]
            kv_w = lo + np.arange(bw8)
            vis = (kv_w < w) & (kv_w >= ws_q) & (kv_w < ws_q + bw_tok)
            row = np.where(vis, 0.0, NEG_INF).astype(np.float32)
            bias[gi * 8 + wj] = np.tile(row, tt * th)
    return bias


def _kernel(
    *refs,
    scale: float,
    tile: Shape3,
    win_eff: Shape3,
    nw: int,
    w_starts: Tuple[int, ...],
    n_chunks: int,
    text_len: int,
    cast_p_to_v_dtype: bool,
    q_mult: int = 1,
    softmax: str = "fast",  # "fast" (no running max) | "stable"
    variant: str = "full",  # diagnostic: full | dots | qk | sT (sT measured 34.9 vs 33.0 ms — operand swap does not help)
    masked_w: bool = False,  # full-width scores + static w-window bias
    grouped: Optional[tuple] = None,  # (n_groups, bw8, los, w_padded) for tw|8
    qk_int8: bool = False,
):
    it = iter(refs)
    _tab_ref = next(it)  # (n_rows, 2) tile-unit starts (consumed by index maps)
    active_ref = next(it)  # (H,) int32
    q_ref = next(it)  # (1, 1, tt, th, W, D)
    k_ref = next(it)  # (1, 1, tt, th, W, D) — current window chunk slab
    v_ref = next(it)
    # masked_w: (tpt_all, kv_len); grouped: (n_groups*8, tt*th*bw8)
    wmask_ref = next(it) if (masked_w or grouped is not None) else None
    tk_ref = next(it) if text_len else None  # (1, 1, Lt, D)
    tv_ref = next(it) if text_len else None
    bias_ref = next(it) if text_len else None  # (1, Lt) f32
    qkc_ref = next(it) if qk_int8 else None  # (1, 1) f32 per-head dequant
    out_ref = next(it)  # (1, 1, tt, th, W, D)
    m_s = next(it)  # (nw, tpt, 1) f32 — one softmax state per w q-tile
    l_s = next(it)
    acc_s = next(it)  # (nw, tpt, D) f32

    g = pl.program_id(1)
    j = pl.program_id(3)
    tt, th, tw = tile
    tpt = q_mult * tt * th * tw  # q rows per stream (q_mult t-tile rows)
    d = q_ref.shape[-1]
    bw = win_eff[2] * tw

    @pl.when(j == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    # q arrives PRE-SCALED by scale*log2(e) (host side), so the kernel's only
    # per-score VPU work in "fast" mode is exp2 + sum + cast
    q_row = q_ref[0, 0]  # (q_mult*tt, th, W, D)
    w_full = q_row.shape[2]
    if grouped is not None:
        # tw | 8 but tw % 8 != 0: stream per 8-token w GROUP — all q/k/out
        # slices land on 8-aligned sublane offsets with 8-multiple widths
        # (free reshapes), k windows are the group's union rounded out to
        # bw8 tokens, and a small static bias masks the over-read
        n_groups, bw8, g_los, _ = grouped
        qs = [
            q_row[:, :, gi * 8 : (gi + 1) * 8, :].reshape(
                q_mult * tt * th * 8, d
            )
            for gi in range(n_groups)
        ]
    elif masked_w:
        # tw not a divisor of 8 either: ONE full-width stream with an
        # additive w-window bias (W slices would be sublane-misaligned)
        tpt_all = q_mult * tt * th * w_full
        qs = [q_row.reshape(tpt_all, d)]
    else:
        qs = [
            q_row[:, :, wi * tw : (wi + 1) * tw, :].reshape(tpt, d)
            for wi in range(nw)
        ]
    k_chunk = k_ref[0, 0]
    v_chunk = v_ref[0, 0]

    def qk_dot(qm, km):
        if qk_int8:
            # int8 x int8 -> int32 on the MXU (2x bf16 rate); one fused f32
            # multiply dequantizes (per-head q_scale*k_scale*scale*log2e)
            return jax.lax.dot_general(
                qm, km,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * qkc_ref[g, 0]
        return jax.lax.dot_general(
            qm, km,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def soft_pv(wi, s, v_wi):
        if softmax == "fast":
            # Unnormalized exp: softmax output is invariant to a constant
            # scaling of p, so no running max and no acc/l rescaling.  Safe
            # for qk-normed models: |s| <= scale*log2e*d*g^2 stays far from
            # f32 exp2 overflow (see sta_pipe_attention docstring).
            p = jnp.exp2(s)
            l_s[wi] += jnp.sum(p, axis=-1, keepdims=True)
            if cast_p_to_v_dtype and v_wi.dtype != jnp.float32:
                p = p.astype(v_wi.dtype)
            acc_s[wi] += jax.lax.dot_general(
                p, v_wi,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return
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

    # nw independent (dot, softmax, pv) streams: the next tile's q@k (MXU)
    # never depends on the previous tile's softmax (VPU).  Inactive heads
    # (participation-masked dispatch) skip all compute: the pipeline still
    # streams their slabs, but those DMAs hide under other heads' compute.
    @pl.when(active_ref[g] > 0)
    def _compute():
        if grouped is not None:
            n_groups, bw8, g_los, _ = grouped
            cols = tt * th * bw8
            for gi in range(n_groups):
                lo = g_los[gi]
                k_g = k_chunk[:, :, lo : lo + bw8, :].reshape(cols, d)
                s = qk_dot(qs[gi], k_g)
                rows = qs[gi].shape[0]
                s = (
                    s.reshape(rows // 8, 8, cols)
                    + wmask_ref[gi * 8 : (gi + 1) * 8, :][None]
                ).reshape(rows, cols)
                v_g = v_chunk[:, :, lo : lo + bw8, :].reshape(cols, d)
                soft_pv(gi, s, v_g)
            return
        if masked_w:
            kv_len = k_chunk.shape[0] * k_chunk.shape[1] * k_chunk.shape[2]
            k_all = k_chunk.reshape(kv_len, d)
            s = qk_dot(qs[0], k_all) + wmask_ref[...]
            v_all = v_chunk.reshape(kv_len, d)
            soft_pv(0, s, v_all)
            return
        for wi in range(nw):
            ws = w_starts[wi]
            k_wi = k_chunk[:, :, ws : ws + bw, :].reshape(tt * th * bw, d)
            if variant == "sT":
                # transposed-score formulation: swap dot operands so Mosaic's
                # operand transpose lands on the small reused q tile instead
                # of the per-stream-chunk K window (fast softmax only)
                sT = jax.lax.dot_general(
                    k_wi, qs[wi],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (kv, tpt)
                p = jnp.exp2(sT)
                l_s[wi] += jnp.sum(p, axis=0)[:, None]
                v_wi = v_chunk[:, :, ws : ws + bw, :].reshape(tt * th * bw, d)
                if cast_p_to_v_dtype and v_wi.dtype != jnp.float32:
                    p = p.astype(v_wi.dtype)
                acc_s[wi] += jax.lax.dot_general(
                    p, v_wi,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                continue
            s = qk_dot(qs[wi], k_wi)
            if variant == "qk":
                acc_s[wi] += jnp.sum(s, axis=-1, keepdims=True) * 1e-3
                continue
            v_wi = v_chunk[:, :, ws : ws + bw, :].reshape(tt * th * bw, d)
            if variant == "dots":
                p = (s * 1e-3).astype(v_wi.dtype)
                acc_s[wi] += jax.lax.dot_general(
                    p, v_wi,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                continue
            soft_pv(wi, s, v_wi)

    @pl.when(j == n_chunks - 1)
    def _finish():
        if text_len:

            @pl.when(active_ref[g] > 0)
            def _text_tail():
                kt = tk_ref[0, 0]
                vt = tv_ref[0, 0]
                for wi in range(len(qs)):
                    s = qk_dot(qs[wi], kt) + bias_ref[0][None, :]
                    soft_pv(wi, s, vt)
        a = (active_ref[g] > 0).astype(jnp.float32)
        if grouped is not None:
            n_groups, _, _, _ = grouped
            for gi in range(n_groups):
                l = l_s[gi]
                out = acc_s[gi] / jnp.where(l == 0.0, 1.0, l)
                out_ref[0, 0, :, :, gi * 8 : (gi + 1) * 8, :] = (
                    (out * a).reshape(q_mult * tt, th, 8, d).astype(out_ref.dtype)
                )
            return
        if masked_w:
            l = l_s[0]
            out = acc_s[0] / jnp.where(l == 0.0, 1.0, l)
            out_ref[0, 0] = (
                (out * a).reshape(q_mult * tt, th, w_full, d).astype(out_ref.dtype)
            )
            return
        for wi in range(nw):
            l = l_s[wi]
            out = acc_s[wi] / jnp.where(l == 0.0, 1.0, l)
            out_ref[0, 0, :, :, wi * tw : (wi + 1) * tw, :] = (
                (out * a).reshape(q_mult * tt, th, tw, d).astype(out_ref.dtype)
            )


def supports_pipe(latent_shape: Shape3, tile: Shape3, d: int,
                  itemsize: int = 2, text_len: int = 0,
                  window: Shape3 = (3, 3, 3)) -> bool:
    """Eligibility: tiles divide the grid and the double-buffered slabs +
    states fit VMEM.  tile_w 8-aligned runs the per-w-tile sliced streams
    (free reshapes of W slices); misaligned tile_w runs the masked-width
    variant (full-slab scores + precomputed w-window bias), whose VMEM
    budget adds the (rows x slab) bias table and full-width f32 scores."""
    t, hh, w = latent_shape
    tt, th, tw = tile
    if t % tt or hh % th or w % tw:
        return False
    nw = w // tw
    tpt = tt * th * tw
    slab = tt * th * w * d * itemsize
    bw = min(window[2], nw) * tw
    common = (
        2 * 2 * slab                       # double-buffered k+v slabs
        + 2 * 2 * slab                     # q/out double-buffered blocks
        + 2 * 2 * text_len * d * itemsize  # text kv blocks (double-buffered)
    )
    if tw % 8 and 8 % tw == 0:
        # grouped-width variant: padded slabs, one bw8-wide stream per
        # 8-token w group
        qm = _q_mult(latent_shape, tile, window)
        w_pad, n_groups, bw8, _ = _w_groups(latent_shape, tile, window)
        slab_p = tt * th * w_pad * d * itemsize
        rows_g = qm * tt * th * 8
        est = (
            2 * 2 * slab_p + 2 * 2 * slab_p
            + 2 * 2 * text_len * d * itemsize
            + n_groups * rows_g * (d + 2) * 4   # acc/m/l states
            + n_groups * 8 * tt * th * bw8 * 4  # bias table
            + 2 * rows_g * tt * th * bw8 * 4    # live f32 scores (x2 margin)
        )
    elif tw % 8:
        qm = _q_mult(latent_shape, tile, window)
        rows = qm * tt * th * w  # single full-width stream
        kv_len = tt * th * w
        est = common + (
            rows * (d + 2) * 4             # acc/m/l states
            + rows * kv_len * 4            # w-window bias table
            + 2 * rows * kv_len * 4        # live f32 scores (x2 margin)
        )
    else:
        est = common + (
            nw * tpt * (d + 2) * 4         # per-tile acc/m/l states
            + 3 * tpt * tt * th * bw * 4   # live f32 scores (x3 margin)
        )
    return est < 40 * 2**20


def sta_pipe_attention(
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
    softmax: str = "fast",
    variant: str = "full",
    qk_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """Same contract as ops.sta_row.sta_row_attention.

    ``qk_scale``: opt-in int8 QK^T — q and k (and text_k, if any) arrive
    already quantized to int8 with per-head symmetric scales whose PRODUCT
    (sq*sk) is ``qk_scale`` (H,) f32; the QK dots run on the int8 MXU path
    and one fused multiply dequantizes the scores (the attention scale and
    exp2 base change fold into the same factor).  V stays in v.dtype.
    Requires softmax="fast" and variant="full".

    ``softmax="fast"`` (default) drops the online running max: q is
    pre-scaled by scale*log2(e) on the host and the kernel computes
    unnormalized ``p = exp2(s)`` — softmax output is invariant to constant
    scaling of p, so correctness is unchanged as long as exp2 stays inside
    f32 range.  For qk-RMSNormed models (Wan and Hunyuan both):
    |s| <= scale*log2e*d*g_q*g_k ~= 16.3*g^2 for d=128, far from the f32
    exp2 limit of 127 for any plausible learned gain.  Pass
    ``softmax="stable"`` for un-normalized q/k distributions.
    """
    b, n_heads, s, d = q.shape
    t, hh, w = latent_shape
    if s != t * hh * w:
        raise ValueError(f"seq len {s} != prod(latent_shape) {latent_shape}")
    tt, th, tw = tile
    if not supports_pipe(latent_shape, tile, d, q.dtype.itemsize,
                         0 if text_k is None else text_k.shape[2],
                         window=window):
        raise ValueError(f"geometry (latent {latent_shape}, tile {tile}) "
                         "not eligible for the pipelined row-dense kernel")
    if d % 128 and not interpret:
        raise ValueError(f"head_dim {d} must be a multiple of 128 on TPU")
    if scale is None:
        scale = d**-0.5
    nt, nh, nw = t // tt, hh // th, w // tw
    win_eff = (min(window[0], nt), min(window[1], nh), min(window[2], nw))
    w_starts = _w_window_starts(latent_shape, tile, window)
    qm = _q_mult(latent_shape, tile, window)
    tpt = qm * tt * th * tw
    n_rows = (nt // qm) * nh
    n_chunks = win_eff[0] * win_eff[1]
    masked_w = tw % 8 != 0
    grouped = None
    wmask = None
    if masked_w and 8 % tw == 0 and variant == "full":
        # tw divides 8: grouped-width variant — 8-token w groups stream a
        # bw8-wide union-window KV slice each (sublane-aligned slices, ~w/bw8
        # x fewer score FLOPs than the full-width masked variant)
        w_pad, n_groups, bw8, g_los = _w_groups(latent_shape, tile, window)
        grouped = (n_groups, bw8, g_los, w_pad)
        masked_w = False
        wmask = jnp.asarray(_w_group_bias(latent_shape, tile, window))
    elif masked_w:
        # misaligned tile_w: full-width scores with a precomputed w-window
        # bias (one VMEM-resident table, identical for every row/chunk/head)
        kv_len = tt * th * w
        tpt_all = qm * tt * th * w
        pos_q = np.arange(tpt_all) % w
        pos_k = np.arange(kv_len) % w
        ws_q = np.asarray(w_starts)[pos_q // tw]
        bw_tok = win_eff[2] * tw
        vis = (pos_k[None, :] >= ws_q[:, None]) & (
            pos_k[None, :] < ws_q[:, None] + bw_tok
        )
        wmask = jnp.asarray(np.where(vis, 0.0, NEG_INF), jnp.float32)

    # row window starts in TILE units: exact block indices for the K/V maps
    # (supertiled cells use the start of their first row — identical by
    # construction of _q_mult)
    starts_el = _row_starts(latent_shape, tile, window).reshape(nt, nh, 2)
    starts_el = starts_el[::qm].reshape(n_rows, 2)
    tab = jnp.asarray(
        np.stack([starts_el[:, 0] // tt, starts_el[:, 1] // th], axis=1),
        jnp.int32,
    )
    qk_int8 = qk_scale is not None
    if qk_int8:
        if softmax != "fast" or variant != "full":
            raise ValueError("qk_scale requires softmax='fast', variant='full'")
        if q.dtype != jnp.int8 or k.dtype != jnp.int8:
            raise ValueError("qk_scale requires int8 q and k")
        q6 = q.reshape(b, n_heads, t, hh, w, d)
        qkc = (qk_scale.astype(jnp.float32) * (scale * LOG2E)).reshape(
            n_heads, 1)
    else:
        # fold the scale and the exp->exp2 base change into q once, host-side
        q6 = (q * jnp.asarray(scale * LOG2E, q.dtype)).reshape(
            b, n_heads, t, hh, w, d)
    k6 = k.reshape(b, n_heads, t, hh, w, d)
    v6 = v.reshape(b, n_heads, t, hh, w, d)
    w_eff = w
    if grouped is not None:
        # zero-pad the w axis to the 8-aligned width (padded q rows are
        # fully masked; padded kv columns masked by the group bias)
        w_eff = grouped[3]
        padw = ((0, 0),) * 4 + ((0, w_eff - w), (0, 0))
        q6, k6, v6 = (jnp.pad(x, padw) for x in (q6, k6, v6))
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
        nw=nw,
        w_starts=tuple(w_starts),
        n_chunks=n_chunks,
        text_len=text_len,
        cast_p_to_v_dtype=cast_p_to_v_dtype,
        q_mult=qm,
        softmax=softmax,
        variant=variant,
        masked_w=masked_w,
        grouped=grouped,
        qk_int8=qk_int8,
    )

    wh = win_eff[1]

    def q_map(bb, gg, ii, jj, *refs):
        return (bb, gg, ii // nh, ii - (ii // nh) * nh, 0, 0)

    def kv_map(bb, gg, ii, jj, *refs):
        tab_ref = refs[0]
        return (bb, gg, tab_ref[ii, 0] + jj // wh,
                tab_ref[ii, 1] + jj - (jj // wh) * wh, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, qm * tt, th, w_eff, d), q_map),
        pl.BlockSpec((1, 1, tt, th, w_eff, d), kv_map),
        pl.BlockSpec((1, 1, tt, th, w_eff, d), kv_map),
    ]
    inputs = [q6, k6, v6]
    if wmask is not None:
        in_specs.append(
            pl.BlockSpec(wmask.shape, lambda bb, gg, ii, jj, *r: (0, 0))
        )
        inputs.append(wmask)
    if text_len:
        def text_map(bb, gg, ii, jj, *refs):
            return (bb, gg, 0, 0)

        in_specs += [
            pl.BlockSpec((1, 1, text_len, d), text_map),
            pl.BlockSpec((1, 1, text_len, d), text_map),
            pl.BlockSpec((1, text_len), lambda bb, gg, ii, jj, *r: (0, 0)),
        ]
        inputs += [text_k.reshape(b, n_heads, text_len, d),
                   text_v.reshape(b, n_heads, text_len, d),
                   text_bias]
    if qk_int8:
        # whole (H, 1) dequant vector as one block ((1, 1) blocks are not
        # lowerable); the kernel indexes it by the head program id
        in_specs.append(
            pl.BlockSpec((n_heads, 1), lambda bb, gg, ii, jj, *r: (0, 0))
        )
        inputs.append(qkc)
    if grouped is not None:
        n_groups = grouped[0]
        rows_g = qm * tt * th * 8
        scratch = [
            pltpu.VMEM((n_groups, rows_g, 1), jnp.float32),
            pltpu.VMEM((n_groups, rows_g, 1), jnp.float32),
            pltpu.VMEM((n_groups, rows_g, d), jnp.float32),
        ]
    elif masked_w:
        scratch = [
            pltpu.VMEM((1, qm * tt * th * w, 1), jnp.float32),
            pltpu.VMEM((1, qm * tt * th * w, 1), jnp.float32),
            pltpu.VMEM((1, qm * tt * th * w, d), jnp.float32),
        ]
    else:
        scratch = [
            pltpu.VMEM((nw, tpt, 1), jnp.float32),
            pltpu.VMEM((nw, tpt, 1), jnp.float32),
            pltpu.VMEM((nw, tpt, d), jnp.float32),
        ]
    out6 = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, n_heads, n_rows, n_chunks),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, qm * tt, th, w_eff, d), q_map),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct(q6.shape, v.dtype if qk_int8 else q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(b * n_heads * n_rows * n_chunks * nw * 4
                      * tpt * tt * th * win_eff[2] * tw * d),
            bytes_accessed=int(
                b * n_heads * n_rows * n_chunks * 2 * tt * th * w * d
                * k.dtype.itemsize
                + q.size * q.dtype.itemsize * 2
            ),
            transcendentals=int(b * n_heads * s * (n_chunks + (1 if text_len else 0))),
        ),
        interpret=interpret,
    )(tab, active.astype(jnp.int32), *inputs)
    if grouped is not None:
        out6 = out6[:, :, :, :, :w, :]
    return out6.reshape(b, n_heads, s, d)
