"""Block-sparse flash attention backward — Pallas dq/dk/dv kernels.

Round 1 backpropagated attention through a chunked XLA reference (recompute;
ops/flash.py attn_bwd) — fine for tiny router-training shapes, ~3x too slow
at video scale.  These kernels implement the standard flash backward over the
same static block tables as the forward:

  forward   saves out and the base-2 log-sum-exp per row (lse2 = m + log2 l
            in the scale*log2(e) domain), one extra (B, H, Sq, 1) output
  backward  delta = rowsum(dout * out)
            dq kernel : grid (b, h, q-block, w) over the row's kv blocks
                        p = 2^(s2 - lse2); ds = p (dp - delta); dq += ds k
            dkv kernel: grid (b, h, kv-block, w) over TRANSPOSED tables
                        dv += p^T dout;  dk += ds^T q

Scope matches the training path: head-shared tables, static kv_valid_len
tail masking, no sub-tile pair bits (training expert tables are exact at
block granularity).  Padded q rows are safe by construction: their upstream
cotangent is zero (callers slice the logical rows) and empty rows carry an
lse sentinel so p underflows to 0.
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
POS_BIG = float(1e30)
LOG2E = 1.4426950408889634


def transpose_tables(
    kv_index: np.ndarray, kv_count: np.ndarray, n_kv_blocks: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(1, nq, W) kv tables -> (1, nkv, WT) q tables (which q blocks visit
    each kv block)."""
    assert kv_index.shape[0] == 1, "backward supports head-shared tables"
    nq = kv_index.shape[1]
    lists = [[] for _ in range(n_kv_blocks)]
    for i in range(nq):
        for j in range(int(kv_count[0, i])):
            lists[int(kv_index[0, i, j])].append(i)
    wt = max(1, max(len(l) for l in lists))
    q_index = np.zeros((1, n_kv_blocks, wt), np.int32)
    q_count = np.zeros((1, n_kv_blocks), np.int32)
    for j, l in enumerate(lists):
        q_count[0, j] = len(l)
        for w, i in enumerate(l):
            q_index[0, j, w] = i
    return q_index, q_count


def _masked_logits(q, k, scale2, kv_block, block_kv, kv_valid_len):
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale2
    if kv_valid_len % block_kv != 0:
        last_block = kv_valid_len // block_kv
        in_block = kv_valid_len % block_kv
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        limit = jnp.where(kv_block == last_block, in_block, block_kv)
        s = jnp.where(col < limit, s, NEG_INF)
    return s


def _dq_kernel(
    *refs, scale: float, width: int, kv_valid_len: int, block_kv: int,
):
    it = iter(refs)
    kv_index_ref = next(it)
    kv_count_ref = next(it)
    q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, dq_ref, acc = it

    i = pl.program_id(2)
    j = pl.program_id(3)
    count = kv_count_ref[0, i]

    @pl.when(j == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    @pl.when(j < count)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        kv_block = kv_index_ref[0, i, j]
        s2 = _masked_logits(q, k, scale * LOG2E, kv_block, block_kv, kv_valid_len)
        p = jnp.exp2(s2 - lse_ref[0, 0])  # (bq, bkv), masked/empty -> 0
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0, 0])
        acc[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == width - 1)
    def _finalize():
        dq_ref[0, 0] = (acc[...] * scale).astype(dq_ref.dtype)


def _dkv_kernel(
    *refs, scale: float, width: int, kv_valid_len: int, block_kv: int,
):
    it = iter(refs)
    q_index_ref = next(it)
    q_count_ref = next(it)
    q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, dk_ref, dv_ref, dk_acc, dv_acc = it

    j = pl.program_id(2)  # kv block
    w = pl.program_id(3)
    count = q_count_ref[0, j]

    @pl.when(w == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    @pl.when(w < count)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        s2 = _masked_logits(q, k, scale * LOG2E, j, block_kv, kv_valid_len)
        p = jnp.exp2(s2 - lse_ref[0, 0])  # (bq, bkv)
        pb = p.astype(do.dtype)
        dv_acc[...] += jax.lax.dot_general(
            pb, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta_ref[0, 0])).astype(q.dtype)
        dk_acc[...] += jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(w == width - 1)
    def _finalize():
        dk_ref[0, 0] = (dk_acc[...] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def flash_backward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    out: jax.Array,
    lse2: jax.Array,  # (B, H, Sq, 1) base-2 row log-sum-exp from the forward
    dout: jax.Array,
    kv_index: jax.Array,  # (1, nq, W)
    kv_count: jax.Array,  # (1, nq)
    q_index: jax.Array,  # (1, nkv, WT) transposed tables
    q_count: jax.Array,  # (1, nkv)
    *,
    scale: float,
    block_q: int,
    block_kv: int,
    kv_valid_len: int,
    interpret: bool = False,
):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    nq, nkv = sq // block_q, skv // block_kv
    width = kv_index.shape[2]
    width_t = q_index.shape[2]
    delta = jnp.sum(
        dout.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True
    )  # (B, H, Sq, 1)

    def q_map(bb, hh, ii, jj, *refs):
        return (bb, hh, ii, 0)

    def kv_map(bb, hh, ii, jj, *refs):
        return (bb, hh, refs[0][0, ii, jj], 0)

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, scale=float(scale), width=width,
            kv_valid_len=int(kv_valid_len), block_kv=block_kv,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, h, nq, width),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d), q_map),
                pl.BlockSpec((1, 1, block_q, d), q_map),
                pl.BlockSpec((1, 1, block_q, 1), q_map),
                pl.BlockSpec((1, 1, block_q, 1), q_map),
                pl.BlockSpec((1, 1, block_kv, d), kv_map),
                pl.BlockSpec((1, 1, block_kv, d), kv_map),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d), q_map),
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_index, kv_count, q, dout, lse2, delta, k, v)

    def kvb_map(bb, hh, jj, ww, *refs):
        return (bb, hh, jj, 0)

    def qt_map(bb, hh, jj, ww, *refs):
        return (bb, hh, refs[0][0, jj, ww], 0)

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, scale=float(scale), width=width_t,
            kv_valid_len=int(kv_valid_len), block_kv=block_kv,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, h, nkv, width_t),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d), qt_map),
                pl.BlockSpec((1, 1, block_q, d), qt_map),
                pl.BlockSpec((1, 1, block_q, 1), qt_map),
                pl.BlockSpec((1, 1, block_q, 1), qt_map),
                pl.BlockSpec((1, 1, block_kv, d), kvb_map),
                pl.BlockSpec((1, 1, block_kv, d), kvb_map),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_kv, d), kvb_map),
                pl.BlockSpec((1, 1, block_kv, d), kvb_map),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_kv, d), jnp.float32),
                pltpu.VMEM((block_kv, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_index, q_count, q, dout, lse2, delta, k, v)
    return dq, dk, dv
