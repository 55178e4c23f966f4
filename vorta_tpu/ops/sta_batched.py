"""Head-batched sliding-tile attention kernel.

Sliding-tile attention is so sparse (~8% of blocks at 720p geometry) that a
per-(head, q-row) grid leaves each kernel invocation with only a handful of
kv chunks — fixed per-cell/per-iteration costs dominate.  This kernel batches
ALL heads into each grid cell: grid is (batch, q-row), every DMA moves an
(H, block_kv, D) chunk and every MXU call is an H-batched matmul, amortizing
the loop overhead H-fold.  Heads not routed to the sliding-tile expert are
zeroed at finalize (their compute share is ~8%/head — cheaper than masking).

Table semantics (head-shared kv_index/kv_count + sub-tile pair bits) match
ops/flash_manual.py.
"""

from __future__ import annotations

import functools
from typing import Optional

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
    subtile,
    has_bias: bool,
    block_q: int,
    block_kv: int,
    num_heads: int,
    cast_p_to_v_dtype: bool,
    softmax: str = "stable",
):
    it = iter(refs)
    kv_index_ref = next(it)
    kv_count_ref = next(it)
    active_ref = next(it)  # (H,) int32: 1 if head participates
    pair_bits_ref = next(it) if subtile is not None else None
    q_ref = next(it)  # (1, H, bq, D)
    k_hbm = next(it)
    v_hbm = next(it)
    bias_ref = next(it) if has_bias else None  # (1, Skv) f32
    (
        out_ref,  # (1, H, bq, D)
        m_s,  # (H, bq, 1) f32
        l_s,
        acc_s,  # (H, bq, D) f32
        k_buf,  # (2, H, bkv, D)
        v_buf,
        dma_sems,
    ) = it

    b = pl.program_id(0)
    g = pl.program_id(1)  # head group
    i = pl.program_id(2)
    hg = num_heads  # heads per group (block shape)
    # skip DMA + compute for head groups with no routed head (callers sort
    # active heads first, so inactive groups are contiguous at the end)
    group_any = active_ref[g * hg]
    for hi in range(1, hg):
        group_any = group_any | active_ref[g * hg + hi]
    count = jnp.where(group_any > 0, kv_count_ref[0, i], 0)

    def kv_dma(slot, j):
        blk = kv_index_ref[0, i, j]
        k_copy = pltpu.make_async_copy(
            k_hbm.at[b, pl.ds(g * hg, hg), pl.ds(blk * block_kv, block_kv), :],
            k_buf.at[slot],
            dma_sems.at[slot, 0],
        )
        v_copy = pltpu.make_async_copy(
            v_hbm.at[b, pl.ds(g * hg, hg), pl.ds(blk * block_kv, block_kv), :],
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

    q = q_ref[0]  # (H, bq, D)

    # loop-invariant: sub-tile bit index per (q-token, kv-token); integer
    # division is expensive on the VPU, so compute it once per grid cell
    bit_idx = None
    if subtile is not None:
        tpt_, _, k_sub_ = subtile
        row_tile = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0) // tpt_
        col_tile = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1) // tpt_
        bit_idx = (row_tile * k_sub_ + col_tile).astype(jnp.uint32)

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

        k = k_buf[slot]  # (H, bkv, D)
        v = v_buf[slot]
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (H, bq, bkv)
        if softmax != "fast":  # fast mode: q arrives pre-scaled (host side)
            s = s * (scale * LOG2E)

        if has_bias:
            blk = kv_index_ref[0, i, j]
            bias = bias_ref[0, pl.ds(blk * block_kv, block_kv)]
            s = s + bias[None, None, :]

        if subtile is not None:
            bits = pair_bits_ref[0, i, j]
            visible = jax.lax.shift_right_logical(
                jnp.broadcast_to(bits, bit_idx.shape).astype(jnp.uint32), bit_idx
            ) & jnp.uint32(1)
            s = jnp.where(visible[None] == 1, s, NEG_INF)

        if softmax == "fast":
            # no running max: q pre-scaled, unnormalized exp2 (output
            # invariant to p's constant scale; see ops/sta_pipe.py for the
            # f32 range argument); masked entries underflow to exactly 0
            p = jnp.exp2(s)
            l_s[...] += jnp.sum(p, axis=-1, keepdims=True)
            if cast_p_to_v_dtype and v.dtype != jnp.float32:
                p = p.astype(v.dtype)
            acc_s[...] += jax.lax.dot_general(
                p, v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
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
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc_s[...] = acc_s[...] * alpha + pv
        return 0

    jax.lax.fori_loop(0, count, body, 0)

    l = l_s[...]
    out = acc_s[...] / jnp.where(l == 0.0, 1.0, l)
    # SMEM only supports scalar loads and Mosaic cannot reshape 1D->3D
    # vectors: mask per head with a static loop of scalar multiplies
    for hi in range(hg):
        a = (active_ref[g * hg + hi] > 0).astype(jnp.float32)
        out_ref[0, hi] = (out[hi] * a).astype(out_ref.dtype)


def sta_flash_headbatched(
    q: jax.Array,  # (B, H, S, D) tiled layout
    k: jax.Array,
    v: jax.Array,
    kv_index: jax.Array,  # (1, nq, W)
    kv_count: jax.Array,  # (1, nq)
    active: jax.Array,  # (H,) bool/int
    *,
    pair_bits: Optional[jax.Array] = None,
    tokens_per_tile: Optional[int] = None,
    kv_bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: int = 384,
    block_kv: int = 384,
    cast_p_to_v_dtype: bool = True,
    interpret: bool = False,
    softmax: str = "stable",
) -> jax.Array:
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if sq % block_q or skv % block_kv:
        raise ValueError(f"seq lens ({sq},{skv}) not divisible by blocks ({block_q},{block_kv})")
    nq = sq // block_q
    if d % 128 and not interpret:
        raise ValueError(
            f"head_dim {d} must be a multiple of 128 (TPU lane width) for the "
            "manual-DMA kernels; use interpret mode or the XLA reference path"
        )
    if scale is None:
        scale = d**-0.5
    subtile = None
    if pair_bits is not None:
        m_sub, k_sub = block_q // tokens_per_tile, block_kv // tokens_per_tile
        if m_sub * k_sub > 32:
            raise ValueError(f"subtile pairs {m_sub}x{k_sub} exceed 32 bits")
        subtile = (tokens_per_tile, m_sub, k_sub)

    # heads per grid cell, bounded by VMEM: q/out blocks are double-buffered
    # by the pipeline (2x each, bf16), acc/m/l scratches are f32 (m/l pad to
    # 128 lanes), and the kv window holds 2 slots each of K and V
    def vmem_bytes(heads):
        q_out = heads * block_q * d * 2 * 4  # q + out, double buffered, bf16
        acc = heads * block_q * d * 4
        ml = 2 * heads * block_q * 128 * 4  # (hg, bq, 1) pads to 128 lanes
        kv = 2 * 2 * heads * block_kv * d * 2
        return q_out + acc + ml + kv

    hg = h
    while hg > 1 and (vmem_bytes(hg) > 5 * 1024 * 1024 or h % hg):
        hg -= 1
    n_groups = h // hg

    has_bias = kv_bias is not None
    kernel = functools.partial(
        _kernel,
        scale=float(scale),
        subtile=subtile,
        has_bias=has_bias,
        block_q=block_q,
        block_kv=block_kv,
        num_heads=hg,
        cast_p_to_v_dtype=cast_p_to_v_dtype,
        softmax=softmax,
    )
    if softmax == "fast":
        q = q * jnp.asarray(scale * LOG2E, q.dtype)

    prefetch = [kv_index, kv_count, active.astype(jnp.int32)]
    if subtile is not None:
        prefetch.append(pair_bits)

    def q_map(bb, gg, ii, *refs):
        return (bb, gg, ii, 0)

    in_specs = [
        pl.BlockSpec((1, hg, block_q, d), q_map),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [q, k, v]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, skv), lambda bb, gg, ii, *r: (0, 0)))
        inputs.append(kv_bias.astype(jnp.float32).reshape(1, skv))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(b, n_groups, nq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hg, block_q, d), q_map),
        scratch_shapes=[
            pltpu.VMEM((hg, block_q, 1), jnp.float32),
            pltpu.VMEM((hg, block_q, 1), jnp.float32),
            pltpu.VMEM((hg, block_q, d), jnp.float32),
            pltpu.VMEM((2, hg, block_kv, d), k.dtype),
            pltpu.VMEM((2, hg, block_kv, d), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    width = kv_index.shape[2]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(b * h * nq * width * 4 * block_q * block_kv * d),
            bytes_accessed=int(q.size * q.dtype.itemsize * 3),
            transcendentals=int(b * h * sq * width),
        ),
        interpret=interpret,
    )(*prefetch, *inputs)
