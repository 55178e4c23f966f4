"""Block-sparse flash attention with a manual DMA pipeline (kernel v3).

The grid-pipelined kernel (ops/flash.py) sizes its innermost grid dimension
by the WIDEST row's kv-block count, so heads routed to sparse experts pay a
fixed ~0.7us bookkeeping cost for every padded step — at video scale that
overhead exceeded the attention itself.  This version runs one grid cell per
(batch, head, q-block) and loops over that row's kv blocks with a
``lax.fori_loop`` whose trip count IS the row's count: skipped work costs
nothing.  K/V stay in HBM and stream through a double-buffered VMEM window
(see pallas guide: Async DMA / Double Buffering).

Same table semantics as ops/flash.py: per-head kv_index/kv_count (traced OK),
per-head kv_valid, and sub-tile pair-bit refinement.
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


def _kernel(
    *refs,
    scale: float,
    shared_head_tables: bool,
    shared_counts: bool,
    per_head_valid: bool,
    has_bias: bool,
    kv_valid_len: int,
    subtile: Optional[Tuple[int, int, int]],
    block_q: int,
    block_kv: int,
    cast_p_to_v_dtype: bool,
    softmax: str = "stable",  # "stable" (running max) | "fast" (see wrapper)
    qk_int8: bool = False,
):
    it = iter(refs)
    kv_index_ref = next(it)
    kv_count_ref = next(it)
    kv_valid_ref = next(it) if per_head_valid else None
    pair_bits_ref = next(it) if subtile is not None else None
    q_ref = next(it)
    k_hbm = next(it)
    v_hbm = next(it)
    bias_ref = next(it) if has_bias else None  # (1, Skv) f32 in VMEM
    qkc_ref = next(it) if qk_int8 else None  # (1, 1) f32 per-head dequant
    (
        out_ref,
        m_s,
        l_s,
        acc_s,
        k_buf,
        v_buf,
        dma_sems,
    ) = it

    b = pl.program_id(0)
    h = pl.program_id(1)
    i = pl.program_id(2)
    th = 0 if shared_head_tables else h
    tc = 0 if shared_counts else h
    count = kv_count_ref[tc, i]

    def kv_dma(slot, j):
        blk = kv_index_ref[th, i, j]
        k_copy = pltpu.make_async_copy(
            k_hbm.at[b, h, pl.ds(blk * block_kv, block_kv), :],
            k_buf.at[slot],
            dma_sems.at[slot, 0],
        )
        v_copy = pltpu.make_async_copy(
            v_hbm.at[b, h, pl.ds(blk * block_kv, block_kv), :],
            v_buf.at[slot],
            dma_sems.at[slot, 1],
        )
        return k_copy, v_copy

    m_s[...] = jnp.full_like(m_s, NEG_INF)
    l_s[...] = jnp.zeros_like(l_s)
    acc_s[...] = jnp.zeros_like(acc_s)

    @pl.when(count > 0)
    def _warmup():
        kc, vc = kv_dma(0, 0)
        kc.start()
        vc.start()

    q = q_ref[0, 0]  # (block_q, D)

    # loop-invariant precomputes (integer division is slow on the VPU)
    bit_idx = None
    if subtile is not None:
        tpt_, _, k_sub_ = subtile
        row_tile = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0) // tpt_
        col_tile = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1) // tpt_
        bit_idx = (row_tile * k_sub_ + col_tile).astype(jnp.uint32)
    col_iota = None
    if per_head_valid or kv_valid_len % block_kv != 0:
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)

    def body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < count)
        def _prefetch():
            kc, vc = kv_dma(jax.lax.rem(j + 1, 2), j + 1)
            kc.start()
            vc.start()

        kc, vc = kv_dma(slot, j)
        kc.wait()
        vc.wait()

        k = k_buf[slot]
        v = v_buf[slot]
        if qk_int8:
            # int8 x int8 -> int32 on the MXU (2x the bf16 rate on v5e);
            # the per-head dequant factor (q_scale*k_scale*scale*log2e)
            # folds into ONE f32 multiply on the scores
            s = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * qkc_ref[h, 0]
        else:
            s = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if softmax != "fast":  # fast mode: q arrives pre-scaled (host)
                s = s * (scale * LOG2E)

        kv_block = kv_index_ref[th, i, j]
        if has_bias:
            # additive logits bias per kv token (already in log2 scale is not
            # needed: -1e30 masks regardless of base)
            bias = bias_ref[0, pl.ds(kv_block * block_kv, block_kv)]
            s = s + bias[None, :]
        if subtile is not None:
            bits = pair_bits_ref[th, i, j]
            visible = jax.lax.shift_right_logical(
                jnp.broadcast_to(bits, s.shape).astype(jnp.uint32), bit_idx
            ) & jnp.uint32(1)
            s = jnp.where(visible == 1, s, NEG_INF)

        if per_head_valid:
            valid = kv_valid_ref[h]
            limit = jnp.clip(valid - kv_block * block_kv, 0, block_kv)
            s = jnp.where(col_iota < limit, s, NEG_INF)
        elif kv_valid_len % block_kv != 0:
            last_block = kv_valid_len // block_kv
            in_block = kv_valid_len % block_kv
            limit = jnp.where(kv_block == last_block, in_block, block_kv)
            s = jnp.where(col_iota < limit, s, NEG_INF)

        if softmax == "fast":
            # unnormalized exp: constant scalings of p cancel in acc/l, so
            # no running max and no rescales (safe for qk-normed inputs —
            # see ops/sta_pipe.py for the f32 range argument); masked
            # entries (s = -1e30) underflow exp2 to exactly 0
            p = jnp.exp2(s)
            l_s[...] += jnp.sum(p, axis=-1, keepdims=True)
            if cast_p_to_v_dtype and v.dtype != jnp.float32:
                p = p.astype(v.dtype)
            acc_s[...] += jax.lax.dot_general(
                p, v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return 0
        m_prev = m_s[...]
        l_prev = l_s[...]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        m_safe = jnp.where(m_new <= NEG_INF, 0.0, m_new)
        p = jnp.exp2(s - m_safe)
        alpha = jnp.exp2(m_prev - m_safe)
        l_s[...] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_s[...] = m_new
        if cast_p_to_v_dtype and v.dtype != jnp.float32:
            p = p.astype(v.dtype)
        pv = jax.lax.dot_general(
            p, v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_s[...] = acc_s[...] * alpha + pv
        return 0

    jax.lax.fori_loop(0, count, body, 0)

    l = l_s[...]
    out_ref[0, 0] = (acc_s[...] / jnp.where(l == 0.0, 1.0, l)).astype(out_ref.dtype)


def sparse_flash_attention_manual(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_index: jax.Array,
    kv_count: jax.Array,
    *,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_kv: int = 512,
    kv_valid_len: Optional[int] = None,
    kv_valid: Optional[jax.Array] = None,
    pair_bits: Optional[jax.Array] = None,
    tokens_per_tile: Optional[int] = None,
    kv_bias: Optional[jax.Array] = None,
    cast_p_to_v_dtype: bool = True,
    interpret: bool = False,
    softmax: str = "stable",
    qk_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """Same contract as ops.flash.sparse_flash_attention_raw (forward only).

    kv_bias: optional (1, Skv) f32 additive logits bias (e.g. -1e30 on padded
    kv positions — handles traced/mid-sequence padding that static tables
    cannot express, like per-prompt text lengths in joint attention).

    softmax="fast" drops the online running max (q pre-scaled host-side,
    unnormalized exp2 — output invariant to p's constant scale).  Only for
    qk-normed inputs: see ops/sta_pipe.py for the f32 range argument.

    qk_scale: opt-in int8 QK^T (SageAttention-style serving mode): q and k
    must arrive already quantized to int8 (symmetric, per head) and
    ``qk_scale`` is the (H,) f32 PRODUCT of their per-head dequant scales
    (sq*sk).  The kernel runs the QK dot on the int8 MXU path (2x bf16
    rate on v5e) and dequantizes scores with one fused multiply; the
    attention scale and exp2 base-change fold into the same factor.  V (and
    the PV dot) stay in v.dtype.  Requires softmax="fast".
    """
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if sq % block_q or skv % block_kv:
        raise ValueError(
            f"seq lens ({sq},{skv}) not divisible by blocks ({block_q},{block_kv})"
        )
    nq = sq // block_q
    if d % 128 and not interpret:
        raise ValueError(
            f"head_dim {d} must be a multiple of 128 (TPU lane width) for the "
            "manual-DMA kernels; use interpret mode or the XLA reference path"
        )
    shared = kv_index.shape[0] == 1
    shared_counts = kv_count.shape[0] == 1
    if not shared and kv_index.shape[0] != h:
        raise ValueError(f"tables head dim {kv_index.shape[0]} != heads {h}")
    if not shared_counts and kv_count.shape[0] != h:
        raise ValueError(f"counts head dim {kv_count.shape[0]} != heads {h}")
    if kv_valid_len is None:
        kv_valid_len = skv
    if scale is None:
        scale = d**-0.5
    subtile = None
    if pair_bits is not None:
        if tokens_per_tile is None:
            raise ValueError("pair_bits requires tokens_per_tile")
        m_sub, k_sub = block_q // tokens_per_tile, block_kv // tokens_per_tile
        if m_sub * k_sub > 32:
            raise ValueError(f"subtile pairs {m_sub}x{k_sub} exceed 32 bits")
        subtile = (tokens_per_tile, m_sub, k_sub)
    per_head_valid = kv_valid is not None

    qk_int8 = qk_scale is not None
    if qk_int8:
        if softmax != "fast":
            raise ValueError("qk_scale (int8 QK) requires softmax='fast'")
        if q.dtype != jnp.int8 or k.dtype != jnp.int8:
            raise ValueError("qk_scale requires int8 q and k")
        qkc = (qk_scale.astype(jnp.float32) * (scale * LOG2E)).reshape(h, 1)
    elif softmax == "fast":
        q = q * jnp.asarray(scale * LOG2E, q.dtype)

    has_bias = kv_bias is not None
    kernel = functools.partial(
        _kernel,
        scale=float(scale),
        shared_head_tables=shared,
        shared_counts=shared_counts,
        per_head_valid=per_head_valid,
        has_bias=has_bias,
        kv_valid_len=int(kv_valid_len),
        subtile=subtile,
        block_q=block_q,
        block_kv=block_kv,
        cast_p_to_v_dtype=cast_p_to_v_dtype,
        softmax=softmax,
        qk_int8=qk_int8,
    )

    prefetch = [kv_index, kv_count]
    if per_head_valid:
        prefetch.append(kv_valid.astype(jnp.int32))
    if subtile is not None:
        prefetch.append(pair_bits)

    def q_map(bb, hh, ii, *refs):
        return (bb, hh, ii, 0)

    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), q_map),
        pl.BlockSpec(memory_space=pl.ANY),  # K stays in HBM
        pl.BlockSpec(memory_space=pl.ANY),  # V stays in HBM
    ]
    inputs = [q, k, v]
    if has_bias:
        # whole bias vector lives in VMEM; index map constant per batch so
        # the pipeline fetches it once
        in_specs.append(pl.BlockSpec((1, skv), lambda bb, hh, ii, *r: (0, 0)))
        inputs.append(kv_bias.astype(jnp.float32).reshape(1, skv))
    if qk_int8:
        # whole (H, 1) dequant-factor vector as one block (TPU lowering
        # rejects (1, 1) blocks); the kernel indexes it by program_id(1)
        in_specs.append(pl.BlockSpec((h, 1), lambda bb, hh, ii, *r: (0, 0)))
        inputs.append(qkc)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(b, h, nq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, d), q_map),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((2, block_kv, d), k.dtype),
            pltpu.VMEM((2, block_kv, d), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    avg_width = kv_index.shape[2]
    out_dtype = v.dtype if qk_int8 else q.dtype
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(b * h * nq * avg_width * 4 * block_q * block_kv * d),
            bytes_accessed=int(q.size * q.dtype.itemsize * 3),
            transcendentals=int(b * h * sq * avg_width),
        ),
        interpret=interpret,
    )(*prefetch, *inputs)
