"""Fused attention prologue: qk-RMSNorm + half-RoPE + head split in one pass.

After the fused qkv projection, the reference applies RMSNorm(q/k), splits
heads, and rotates q/k (vorta/attention/wan.py:64-101) as separate torch
ops; the XLA equivalent here compiled to several elementwise passes plus a
(B, S, H, d) -> (B, H, S, d) transpose copy per tensor — ~7 ms of the
110 ms block budget at Wan 720p (STATUS per-block budget).

This kernel reads each of q/k/v once as contiguous (bs, D) row slabs,
computes the across-heads RMS in-cell (full row is resident), applies the
gain and the contiguous-half rotation per 128-lane head block, and writes
straight into the kernels' (B, H, S, d) head-major layout — one read + one
write per element, the bandwidth floor for this op.

The rotation matches ops/rope.apply_rope_half exactly (the importer's
column permutation makes it bit-identical to the reference's interleaved
complex multiply); RMSNorm matches models' RMSNorm (f32 accumulation,
learnable gain, eps inside the rsqrt).

Inference-only (hard/off routing): no VJP is defined — the soft-routing
training path keeps the XLA ops, whose fusions are what the per-block remat
wants anyway.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Read once at import: the gate is consulted at TRACE time inside jitted
# model code, so flipping it after a program is compiled has no effect on
# cached executables anyway.  Change it via set_prologue_mode() (and expect
# a retrace), not by mutating the environment mid-process.
_PROLOGUE_MODE = os.environ.get("VORTA_PROLOGUE", "fused")


def set_prologue_mode(mode: str) -> None:
    """Override the fused-prologue gate ('fused' | 'off').

    Only affects programs traced AFTER the call — already-compiled
    executables keep whatever mode they were traced with."""
    global _PROLOGUE_MODE
    _PROLOGUE_MODE = mode


def _row_cap(dim: int) -> int:
    """Block rows so the f32 row intermediates stay within scoped VMEM:
    bs*dim <= 384k elements (bs=256 at Wan-1.3B's 1536, 64 at 14B's 5120)."""
    return max(16, (384 * 1024 // dim) // 16 * 16)


def _pick_block(s: int, cap: int) -> Optional[int]:
    """Largest multiple-of-16 divisor of s not exceeding cap."""
    best = None
    for bs in range(16, cap + 1, 16):
        if s % bs == 0:
            best = bs
    return best


def _prologue_kernel(q_ref, k_ref, v_ref, gq_ref, gk_ref, cos_ref, sin_ref,
                     qo_ref, ko_ref, vo_ref, *, num_heads, eps, qk_norm,
                     norm_scope):
    d = qo_ref.shape[-1]
    h2 = d // 2
    cos = cos_ref[...]  # (bs, d//2) f32
    sin = sin_ref[...]

    def norm_row(x_ref, g_ref):
        xf = x_ref[0].astype(jnp.float32)  # (bs, D)
        if not qk_norm:
            return xf
        r = jax.lax.rsqrt(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps
        )
        # round through the input dtype so outputs are bit-identical to the
        # unfused path (norm casts to bf16 before the f32 rotation there)
        return (xf * r * g_ref[0].astype(jnp.float32)).astype(
            x_ref.dtype
        ).astype(jnp.float32)

    def norm_head(x_ref, g_ref, h):
        xf = x_ref[0][:, h * d : (h + 1) * d].astype(jnp.float32)  # (bs, d)
        if not qk_norm:
            return xf
        r = jax.lax.rsqrt(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps
        )
        g = g_ref[0][h * d : (h + 1) * d].astype(jnp.float32)
        return (xf * r * g).astype(x_ref.dtype).astype(jnp.float32)

    if norm_scope == "row":
        qn_full = norm_row(q_ref, gq_ref)
        kn_full = norm_row(k_ref, gk_ref)
    for h in range(num_heads):
        if norm_scope == "row":
            qn = qn_full[:, h * d : (h + 1) * d]
            kn = kn_full[:, h * d : (h + 1) * d]
        else:
            qn = norm_head(q_ref, gq_ref, h)
            kn = norm_head(k_ref, gk_ref, h)
        x1, x2 = qn[:, :h2], qn[:, h2:]
        qo_ref[0, h] = jnp.concatenate(
            [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
        ).astype(qo_ref.dtype)
        y1, y2 = kn[:, :h2], kn[:, h2:]
        ko_ref[0, h] = jnp.concatenate(
            [y1 * cos - y2 * sin, y1 * sin + y2 * cos], axis=-1
        ).astype(ko_ref.dtype)
        vo_ref[0, h] = v_ref[0][:, h * d : (h + 1) * d]


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "eps", "qk_norm", "interpret", "norm_scope"),
)
def fused_qk_prologue(
    q: jax.Array,  # (B, S, D)
    k: jax.Array,
    v: jax.Array,
    gain_q: Optional[jax.Array],  # (D,) f32 or None
    gain_k: Optional[jax.Array],
    cos: jax.Array,  # (S, d//2) f32 — pad rows with (cos=1, sin=0) for any
    sin: jax.Array,  # trailing no-rotation region (e.g. joint text tokens)
    *,
    num_heads: int,
    eps: float = 1e-6,
    qk_norm: bool = True,
    interpret: bool = False,
    norm_scope: str = "row",  # "row": RMS over D (Wan); "head": per head d
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    b, s, dim = q.shape
    d = dim // num_heads
    assert cos.shape[0] == s, (cos.shape, s)  # pad with (1, 0) rows upstream
    bs = _pick_block(s, _row_cap(dim))
    assert bs is not None, s  # callers gate on supports_prologue
    nblk = s // bs

    if gain_q is None:
        gain_q = jnp.ones((dim,), jnp.float32)
        gain_k = jnp.ones((dim,), jnp.float32)
    gq = gain_q.reshape(1, dim).astype(jnp.float32)
    gk = gain_k.reshape(1, dim).astype(jnp.float32)

    row = pl.BlockSpec((1, bs, dim), lambda bi, si: (bi, si, 0))
    gain = pl.BlockSpec((1, dim), lambda bi, si: (0, 0))
    trig = pl.BlockSpec((bs, d // 2), lambda bi, si: (si, 0))
    headmajor = pl.BlockSpec(
        (1, num_heads, bs, d), lambda bi, si: (bi, 0, si, 0)
    )
    out_shape = jax.ShapeDtypeStruct((b, num_heads, s, d), q.dtype)

    kernel = functools.partial(
        _prologue_kernel, num_heads=num_heads, eps=eps, qk_norm=qk_norm,
        norm_scope=norm_scope,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, nblk),
        in_specs=[row, row, row, gain, gain, trig, trig],
        out_specs=[headmajor, headmajor, headmajor],
        out_shape=[out_shape, out_shape, out_shape],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(q, k, v, gq, gk, cos.astype(jnp.float32), sin.astype(jnp.float32))


def supports_prologue(s: int, dim: int, num_heads: int) -> bool:
    d = dim // num_heads
    return (
        _pick_block(s, _row_cap(dim)) is not None
        and d % 128 == 0
        and dim == num_heads * d
    )


def use_fused_prologue(routing_mode: str, s: int, dim: int, num_heads: int) -> bool:
    """Inference-path gate shared by all call sites: no VJP is defined, so
    the soft-routing training path keeps the differentiable XLA ops."""
    return (
        routing_mode != "soft"
        and _PROLOGUE_MODE == "fused"
        and supports_prologue(s, dim, num_heads)
    )
