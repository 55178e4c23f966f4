"""Block-sparse flash attention for TPU (Pallas).

One kernel expresses every VORTA attention expert:
  * full 3D attention      -> every kv block active (dense tables)
  * sliding-tile attention -> kv blocks from the static tile visibility mask
    (reference drives a compiled flex_attention Triton kernel instead:
    vorta/attention/sliding_attn_flex.py)
  * low-res (coreset)      -> dense tables over the (shorter) pooled
    sequence, tail masked via ``kv_valid_len``
and, because the tables are *operands* (scalar-prefetched, so they may be
traced data), a single call can give each head its own visitation pattern —
that is how hard per-head routing runs without gather/scatter of heads or
recompilation (reference gathers head subsets per expert instead:
vorta/attention/wan.py:388-438).

Mechanics: grid (B, H, num_q_blocks, W).  For q block ``i`` of head ``h``,
``kv_index[h, i, j]`` names the j-th active kv block; entries past
``kv_count[h, i]`` repeat the previous entry, so the Pallas pipeline elides
their DMA and ``pl.when`` skips their compute — inactive steps cost ~nothing.
Online softmax runs in f32 scratch across the W dimension.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention_ref import attention_chunked

NEG_INF = float(-1e30)


# ---------------------------------------------------------------------------
# Static block tables (hashable so they can parameterize jitted closures)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BlockTables:
    """Per-(head, q-block) kv-block visitation lists.

    kv_index: (H_tab, n_q_blocks, W) int32 — padded by repeating the last
        active entry.  H_tab is 1 when all heads share the pattern.
    kv_count: (H_tab, n_q_blocks) int32 — number of active entries.
    """

    kv_index: np.ndarray
    kv_count: np.ndarray

    def __post_init__(self):
        object.__setattr__(self, "kv_index", np.ascontiguousarray(self.kv_index, np.int32))
        object.__setattr__(self, "kv_count", np.ascontiguousarray(self.kv_count, np.int32))
        if self.kv_index.ndim != 3 or self.kv_count.ndim != 2:
            raise ValueError("kv_index must be (H, nq, W); kv_count (H, nq)")

    @functools.cached_property
    def _digest(self) -> bytes:
        import hashlib

        h = hashlib.sha256()
        h.update(self.kv_index.tobytes())
        h.update(self.kv_count.tobytes())
        h.update(str(self.kv_index.shape).encode())
        return h.digest()

    def __hash__(self):
        return hash(self._digest)

    def __eq__(self, other):
        return isinstance(other, BlockTables) and self._digest == other._digest

    @property
    def num_q_blocks(self) -> int:
        return self.kv_index.shape[1]

    @property
    def width(self) -> int:
        return self.kv_index.shape[2]

    def block_mask(self, n_kv_blocks: int) -> np.ndarray:
        """Densify to (H_tab, nq, n_kv_blocks) bool (for oracle / backward)."""
        h, nq, w = self.kv_index.shape
        mask = np.zeros((h, nq, n_kv_blocks), dtype=bool)
        for hi in range(h):
            for qi in range(nq):
                c = self.kv_count[hi, qi]
                mask[hi, qi, self.kv_index[hi, qi, :c]] = True
        return mask


def dense_tables(n_q_blocks: int, n_kv_blocks: int) -> BlockTables:
    kv_index = np.broadcast_to(
        np.arange(n_kv_blocks, dtype=np.int32), (1, n_q_blocks, n_kv_blocks)
    )
    kv_count = np.full((1, n_q_blocks), n_kv_blocks, dtype=np.int32)
    return BlockTables(kv_index=kv_index, kv_count=kv_count)


def tables_from_block_mask(block_mask: np.ndarray, pad_to: Optional[int] = None) -> BlockTables:
    """block_mask: (nq, nkv) or (H, nq, nkv) bool."""
    from ..geometry import block_mask_to_tables

    if block_mask.ndim == 2:
        block_mask = block_mask[None]
    idx_list, cnt_list = [], []
    width = pad_to
    if width is None:
        width = max(1, int(block_mask.sum(axis=-1).max()))
    for hm in block_mask:
        idx, cnt = block_mask_to_tables(hm, pad_to=width)
        idx_list.append(idx)
        cnt_list.append(cnt)
    return BlockTables(kv_index=np.stack(idx_list), kv_count=np.stack(cnt_list))


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _flash_kernel(
    *refs,
    scale: float,
    width: int,
    shared_head_tables: bool,
    kv_valid_len: int,
    per_head_valid: bool,
    subtile: Optional[Tuple[int, int, int]],  # (tokens_per_tile, M, K)
    block_kv: int,
    cast_p_to_v_dtype: bool,
    return_lse: bool = False,
):
    # unpack: scalar-prefetch refs (order matches the call), then in/out/scratch
    it = iter(refs)
    kv_index_ref = next(it)
    kv_count_ref = next(it)
    kv_valid_ref = next(it) if per_head_valid else None
    pair_bits_ref = next(it) if subtile is not None else None
    q_ref = next(it)
    k_ref = next(it)
    v_ref = next(it)
    out_ref = next(it)
    lse_ref = next(it) if return_lse else None
    m_scratch, l_scratch, acc_scratch = it

    h = pl.program_id(1)
    i = pl.program_id(2)
    j = pl.program_id(3)
    th = 0 if shared_head_tables else h
    count = kv_count_ref[th, i]

    @pl.when(j == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    @pl.when(j < count)
    def _compute():
        q = q_ref[0, 0]  # (block_q, D)
        k = k_ref[0, 0]  # (block_kv, D)
        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # work in base-2: exp2 is cheaper than exp on the VPU, and the
        # softmax is invariant to the change of base once folded into scale
        s = s * (scale * 1.4426950408889634)  # (block_q, block_kv)

        kv_block = kv_index_ref[th, i, j]

        if subtile is not None:
            # sub-tile visibility refinement: blocks span several attention
            # tiles; bit (m*K + kk) of pair_bits says whether q sub-tile m of
            # this q block sees kv sub-tile kk of this kv block
            tpt, m_sub, k_sub = subtile
            bits = pair_bits_ref[th, i, j]
            row_tile = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) // tpt
            col_tile = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) // tpt
            bit_idx = row_tile * k_sub + col_tile
            visible = jax.lax.shift_right_logical(
                jnp.broadcast_to(bits, s.shape).astype(jnp.uint32),
                bit_idx.astype(jnp.uint32),
            ) & jnp.uint32(1)
            s = jnp.where(visible == 1, s, NEG_INF)

        # mask padded kv tail beyond the logical sequence length
        if per_head_valid:
            valid = kv_valid_ref[h]
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            limit = jnp.clip(valid - kv_block * block_kv, 0, block_kv)
            s = jnp.where(col < limit, s, NEG_INF)
        elif kv_valid_len % block_kv != 0:
            last_block = kv_valid_len // block_kv
            valid_in_block = kv_valid_len % block_kv
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            limit = jnp.where(kv_block == last_block, valid_in_block, block_kv)
            s = jnp.where(col < limit, s, NEG_INF)

        m_prev = m_scratch[...]  # (block_q, 1)
        l_prev = l_scratch[...]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        m_safe = jnp.where(m_new <= NEG_INF, 0.0, m_new)
        # exp2 underflows to exactly 0 for masked (-1e30) entries and for the
        # initial m_prev, so no extra where-passes over the big block needed
        p = jnp.exp2(s - m_safe)
        alpha = jnp.exp2(m_prev - m_safe)
        l_scratch[...] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_scratch[...] = m_new

        v = v_ref[0, 0]  # (block_kv, D)
        if cast_p_to_v_dtype and v.dtype != jnp.float32:
            p = p.astype(v.dtype)
        pv = jax.lax.dot_general(
            p,
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scratch[...] = acc_scratch[...] * alpha + pv

    @pl.when(j == width - 1)
    def _finalize():
        l = l_scratch[...]
        out = acc_scratch[...] / jnp.where(l == 0.0, 1.0, l)
        out_ref[0, 0] = out.astype(out_ref.dtype)
        if return_lse:
            # base-2 log-sum-exp in the scaled domain; empty rows carry a
            # +inf-ish sentinel so the backward's exp2(s2 - lse) underflows
            lse = m_scratch[...] + jnp.log2(jnp.where(l == 0.0, 1.0, l))
            lse_ref[0, 0] = jnp.where(l == 0.0, 1e30, lse)


def sparse_flash_attention_raw(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_index: jax.Array,
    kv_count: jax.Array,
    *,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_kv: int = 256,
    kv_valid_len: Optional[int] = None,
    kv_valid: Optional[jax.Array] = None,
    pair_bits: Optional[jax.Array] = None,
    tokens_per_tile: Optional[int] = None,
    cast_p_to_v_dtype: bool = True,
    return_lse: bool = False,
    interpret: bool = False,
):
    """Block-sparse flash attention forward (no VJP attached here; see
    make_sparse_attention).  With return_lse=True also returns the per-row
    base-2 log-sum-exp (B, H, Sq, 1) consumed by ops/flash_bwd.

    q: (B, H, Sq, D); k/v: (B, H, Skv, D).
    kv_index: (H_tab, Sq//block_q, W) int32; kv_count: (H_tab, Sq//block_q).
    H_tab is 1 (shared across heads) or H.  Tables may be traced arrays —
    this is what the fused routed-inference path relies on.
    kv_valid_len (static) masks the kv tail beyond the logical length;
    kv_valid (traced, (H,) int32) does the same per head — the fused routed
    path uses it because pooled (low-res) heads have a shorter logical kv.
    pair_bits ((H_tab, nq, W) int32) + tokens_per_tile enable sub-tile
    visibility refinement when kernel blocks span multiple attention tiles.
    """
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if sq % block_q or skv % block_kv:
        raise ValueError(f"seq lens ({sq},{skv}) not divisible by blocks ({block_q},{block_kv})")
    nq = sq // block_q
    width = kv_index.shape[2]
    shared = kv_index.shape[0] == 1
    if not shared and kv_index.shape[0] != h:
        raise ValueError(f"tables head dim {kv_index.shape[0]} != heads {h}")
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

    kernel = functools.partial(
        _flash_kernel,
        scale=float(scale),
        width=width,
        shared_head_tables=shared,
        kv_valid_len=int(kv_valid_len),
        per_head_valid=per_head_valid,
        subtile=subtile,
        block_kv=block_kv,
        cast_p_to_v_dtype=cast_p_to_v_dtype,
        return_lse=return_lse,
    )

    prefetch = [kv_index, kv_count]
    if per_head_valid:
        prefetch.append(kv_valid.astype(jnp.int32))
    if subtile is not None:
        prefetch.append(pair_bits)

    def q_map(bb, hh, ii, jj, *refs):
        return (bb, hh, ii, 0)

    def kv_map(bb, hh, ii, jj, *refs):
        th = 0 if shared else hh
        return (bb, hh, refs[0][th, ii, jj], 0)

    out_specs = pl.BlockSpec((1, 1, block_q, d), q_map)
    out_shape = jax.ShapeDtypeStruct((b, h, sq, d), q.dtype)
    if return_lse:
        out_specs = [out_specs, pl.BlockSpec((1, 1, block_q, 1), q_map)]
        out_shape = [out_shape, jax.ShapeDtypeStruct((b, h, sq, 1), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(b, h, nq, width),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), q_map),
            pl.BlockSpec((1, 1, block_kv, d), kv_map),
            pl.BlockSpec((1, 1, block_kv, d), kv_map),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )

    flops_per_block = 4 * block_q * block_kv * d
    total_active = float(b * h * nq) * width  # upper bound
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(total_active * flops_per_block),
            bytes_accessed=int(q.size * q.dtype.itemsize * 3),
            transcendentals=int(b * h * sq * width),
        ),
        interpret=interpret,
    )(*prefetch, q, k, v)


@functools.lru_cache(maxsize=64)
def make_sparse_attention(
    tables: BlockTables,
    *,
    n_kv_blocks: int,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_kv: int = 256,
    kv_valid_len: Optional[int] = None,
    interpret: bool = False,
    xla_bwd: bool = False,
):
    """Differentiable block-sparse attention with *static* tables.

    Forward runs the Pallas kernel (saving the per-row log-sum-exp); backward
    runs the Pallas dq/dk/dv kernels over the same tables plus their
    transpose (ops/flash_bwd.py).  ``xla_bwd=True`` keeps the round-1
    chunked-XLA recompute backward — the oracle the kernel gradients are
    tested against.
    """
    # keep tables as numpy here: converting to device arrays at factory time
    # would capture a tracer if the factory is first hit inside a jit trace,
    # and the lru_cache would leak it into later traces
    kv_index_np = tables.kv_index
    kv_count_np = tables.kv_count
    mask_np = tables.block_mask(n_kv_blocks)
    use_kernel_bwd = not xla_bwd and kv_index_np.shape[0] == 1
    if use_kernel_bwd:
        from .flash_bwd import transpose_tables

        q_index_np, q_count_np = transpose_tables(
            kv_index_np, kv_count_np, n_kv_blocks
        )

    def fwd_impl(q, k, v, return_lse=False):
        return sparse_flash_attention_raw(
            q,
            k,
            v,
            jnp.asarray(kv_index_np),
            jnp.asarray(kv_count_np),
            scale=scale,
            block_q=block_q,
            block_kv=block_kv,
            kv_valid_len=kv_valid_len,
            return_lse=return_lse,
            interpret=interpret,
        )

    def ref_impl(q, k, v):
        h = q.shape[1]
        bm = jnp.asarray(mask_np)
        if bm.shape[0] == 1:
            bm = jnp.broadcast_to(bm, (h,) + bm.shape[1:])
        return attention_chunked(
            q,
            k,
            v,
            block_mask=bm,
            scale=scale,
            block_q=block_q,
            block_kv=block_kv,
            kv_valid_len=kv_valid_len,
        )

    @jax.custom_vjp
    def attn(q, k, v):
        return fwd_impl(q, k, v)

    if use_kernel_bwd:
        from .flash_bwd import flash_backward

        def attn_fwd(q, k, v):
            out, lse = fwd_impl(q, k, v, return_lse=True)
            return out, (q, k, v, out, lse)

        def attn_bwd(res, g):
            q, k, v, out, lse = res
            d = q.shape[-1]
            return flash_backward(
                q, k, v, out, lse, g,
                jnp.asarray(kv_index_np), jnp.asarray(kv_count_np),
                jnp.asarray(q_index_np), jnp.asarray(q_count_np),
                scale=float(scale) if scale is not None else d**-0.5,
                block_q=block_q,
                block_kv=block_kv,
                kv_valid_len=kv_valid_len if kv_valid_len is not None
                else n_kv_blocks * block_kv,
                interpret=interpret,
            )
    else:
        def attn_fwd(q, k, v):
            return fwd_impl(q, k, v), (q, k, v)

        def attn_bwd(res, g):
            q, k, v = res
            _, vjp = jax.vjp(ref_impl, q, k, v)
            return vjp(g)

    attn.defvjp(attn_fwd, attn_bwd)
    return attn
