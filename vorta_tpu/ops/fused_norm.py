"""Fused LayerNorm / RMSNorm (+ AdaLN modulation) Pallas kernels.

XLA lowers the f32 norm statistics of a (B, 72000, 1536) bf16 stream as
separate convert+reduce ops running at ~120 GB/s, then re-reads the stream to
apply — measured ~9.5 ms per Wan block at 720p (tools/profile_ops.py,
model_full), i.e. norms alone cost ~15% of a routed denoise block.  These
kernels read the row tile once into VMEM, compute two-pass f32 statistics
in-register, apply the (optional) AdaLN scale/shift in the same pass, and
write the result — one HBM read + one write at streaming bandwidth.

The reference applies LayerNorm in f32 regardless of activation dtype
(diffusers FP32LayerNorm; vorta keeps that semantic — models/common.py), and
AdaLN modulation as norm(x) * (1 + scale) + shift (modeling_wan.py:195-239).

Gradients: router-only training differentiates *through* norms, so the
kernel carries a custom_vjp whose backward recomputes the statistics with
plain XLA ops (standard layernorm backward; no second Pallas kernel needed —
the backward is only exercised at training shapes).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_rows(s: int, dim: int) -> int:
    # cap sized so double-buffered bf16 blocks + the kernel's f32 temporaries
    # stay well under the ~16MB scoped-vmem limit at any model width
    cap = max(8, 500_000 // dim)
    """Largest divisor of ``s`` that is <= cap and a multiple of 8."""
    best = 0
    for r in range(8, cap + 1, 8):
        if s % r == 0:
            best = r
    return best


def _kernel(x_ref, *rest, rms: bool, eps: float, has_mod: bool, has_affine: bool,
            has_beta: bool, out_f32: bool):
    it = iter(rest)
    scale_ref = next(it) if has_mod else None  # (1, dim) f32
    shift_ref = next(it) if has_mod else None
    gamma_ref = next(it) if has_affine else None  # (1, dim) f32
    beta_ref = next(it) if has_beta else None
    out_ref = next(it)

    x = x_ref[0].astype(jnp.float32)  # (rows, dim)
    dim = x.shape[-1]
    if rms:
        ms = jnp.mean(x * x, axis=-1, keepdims=True)
        y = x * jax.lax.rsqrt(ms + eps)
    else:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        xc = x - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + eps)
    if has_affine:
        y = y * gamma_ref[0][None, :]
        if beta_ref is not None:
            y = y + beta_ref[0][None, :]
    if has_mod:
        y = y * (1.0 + scale_ref[0][None, :]) + shift_ref[0][None, :]
    out_ref[0] = y.astype(out_ref.dtype)


def _norm_fwd_pallas(
    x: jax.Array,  # (B, S, dim)
    scale: Optional[jax.Array],  # (B, dim) f32 or None
    shift: Optional[jax.Array],
    gamma: Optional[jax.Array],  # (dim,) f32 or None
    beta: Optional[jax.Array],
    *,
    rms: bool,
    eps: float,
    out_f32: bool,
    interpret: bool = False,
) -> jax.Array:
    b, s, dim = x.shape
    rows = _pick_rows(s, dim)
    has_mod = scale is not None
    has_affine = gamma is not None
    has_beta = beta is not None
    kernel = functools.partial(
        _kernel, rms=rms, eps=float(eps), has_mod=has_mod,
        has_affine=has_affine, has_beta=has_beta, out_f32=out_f32,
    )
    in_specs = [pl.BlockSpec((1, rows, dim), lambda bb, ii: (bb, ii, 0))]
    inputs = [x]
    if has_mod:
        in_specs += [
            pl.BlockSpec((1, dim), lambda bb, ii: (bb, 0)),
            pl.BlockSpec((1, dim), lambda bb, ii: (bb, 0)),
        ]
        inputs += [scale.astype(jnp.float32), shift.astype(jnp.float32)]
    if has_affine:
        in_specs.append(pl.BlockSpec((1, dim), lambda bb, ii: (0, 0)))
        inputs.append(gamma.astype(jnp.float32).reshape(1, dim))
    if has_beta:
        in_specs.append(pl.BlockSpec((1, dim), lambda bb, ii: (0, 0)))
        inputs.append(beta.astype(jnp.float32).reshape(1, dim))
    out_dtype = jnp.float32 if out_f32 else x.dtype
    return pl.pallas_call(
        kernel,
        grid=(b, s // rows),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows, dim), lambda bb, ii: (bb, ii, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, dim), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)


def _norm_ref(x, scale, shift, gamma, beta, *, rms, eps, out_f32):
    """Plain-XLA reference (also the CPU/interpret fallback)."""
    xf = x.astype(jnp.float32)
    if rms:
        y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    else:
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + eps)
    if gamma is not None:
        y = y * gamma.astype(jnp.float32)[None, None, :]
        if beta is not None:
            y = y + beta.astype(jnp.float32)[None, None, :]
    if scale is not None:
        y = y * (1.0 + scale.astype(jnp.float32)[:, None, :]) \
            + shift.astype(jnp.float32)[:, None, :]
    return y if out_f32 else y.astype(x.dtype)


def _use_pallas(x: jax.Array) -> bool:
    if x.ndim != 3:
        return False
    if jax.default_backend() != "tpu":
        return False
    b, s, dim = x.shape
    return dim % 128 == 0 and _pick_rows(s, dim) >= 8


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_norm(x, scale, shift, gamma, beta, rms: bool, eps: float,
               out_f32: bool):
    """LayerNorm/RMSNorm in f32 with optional affine params and optional AdaLN
    ``* (1 + scale) + shift`` modulation, fused into one read+write pass.

    x: (B, S, dim); scale/shift: (B, dim) or None; gamma/beta: (dim,) or None.
    """
    if _use_pallas(x):
        return _norm_fwd_pallas(
            x, scale, shift, gamma, beta, rms=rms, eps=eps, out_f32=out_f32)
    return _norm_ref(x, scale, shift, gamma, beta, rms=rms, eps=eps,
                     out_f32=out_f32)


def _fused_norm_fwd(x, scale, shift, gamma, beta, rms, eps, out_f32):
    out = fused_norm(x, scale, shift, gamma, beta, rms, eps, out_f32)
    return out, (x, scale, shift, gamma, beta)


def _fused_norm_bwd(rms, eps, out_f32, res, g):
    x, scale, shift, gamma, beta = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    n = xf.shape[-1]
    if rms:
        ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(ms + eps)
        xhat = xf * inv
    else:
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + eps)
        xhat = xc * inv

    # d(out)/d(xhat) chain: out = (xhat*gamma + beta) * (1+scale) + shift
    gmod = gf
    d_scale = d_shift = None
    if scale is not None:
        affed = xhat if gamma is None else xhat * gamma.astype(jnp.float32)[None, None, :]
        if beta is not None:
            affed = affed + beta.astype(jnp.float32)[None, None, :]
        d_scale = jnp.sum(gf * affed, axis=1).astype(scale.dtype)
        d_shift = jnp.sum(gf, axis=1).astype(shift.dtype)
        gmod = gf * (1.0 + scale.astype(jnp.float32)[:, None, :])
    d_gamma = d_beta = None
    ghat = gmod
    if gamma is not None:
        d_gamma = jnp.sum(gmod * xhat, axis=(0, 1)).astype(gamma.dtype)
        if beta is not None:
            d_beta = jnp.sum(gmod, axis=(0, 1)).astype(beta.dtype)
        ghat = gmod * gamma.astype(jnp.float32)[None, None, :]

    if rms:
        dot = jnp.mean(ghat * xhat, axis=-1, keepdims=True)
        dx = (ghat - xhat * dot) * inv
    else:
        mean_g = jnp.mean(ghat, axis=-1, keepdims=True)
        dot = jnp.mean(ghat * xhat, axis=-1, keepdims=True)
        dx = (ghat - mean_g - xhat * dot) * inv
    return (dx.astype(x.dtype), d_scale, d_shift, d_gamma, d_beta)


fused_norm.defvjp(_fused_norm_fwd, _fused_norm_bwd)


# ---- convenience wrappers ----------------------------------------------------

def layernorm_fp32(x, eps=1e-6, gamma=None, beta=None, out_f32=False):
    return fused_norm(x, None, None, gamma, beta, False, eps, out_f32)


def adaln_layernorm(x, scale, shift, eps=1e-6, gamma=None, beta=None):
    """norm(x) * (1 + scale) + shift, output in x.dtype.  scale/shift (B, dim)."""
    return fused_norm(x, scale, shift, gamma, beta, False, eps, False)


def rmsnorm(x, weight, eps=1e-6):
    return fused_norm(x, None, None, weight, None, True, eps, False)


# ---- residual + norm fusion --------------------------------------------------

def _res_kernel(x_ref, d_ref, *rest, rms: bool, eps: float, has_gate: bool,
                has_mod: bool, has_affine: bool, has_beta: bool):
    it = iter(rest)
    gate_ref = next(it) if has_gate else None  # (1, dim) f32
    scale_ref = next(it) if has_mod else None
    shift_ref = next(it) if has_mod else None
    gamma_ref = next(it) if has_affine else None
    beta_ref = next(it) if has_beta else None
    xnew_ref = next(it)
    y_ref = next(it)

    x = x_ref[0].astype(jnp.float32)
    dl = d_ref[0].astype(jnp.float32)
    if has_gate:
        dl = dl * gate_ref[0][None, :]
    xn = x + dl
    xnew_ref[0] = xn.astype(xnew_ref.dtype)
    # norm statistics on the ROUNDED residual so the normed output matches
    # norm(x_new.astype(dtype)) exactly (what the unfused code computes)
    xn = xnew_ref[0].astype(jnp.float32)
    mean = jnp.mean(xn, axis=-1, keepdims=True)
    xc = xn - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    if has_affine:
        y = y * gamma_ref[0][None, :]
        if beta_ref is not None:
            y = y + beta_ref[0][None, :]
    if has_mod:
        y = y * (1.0 + scale_ref[0][None, :]) + shift_ref[0][None, :]
    y_ref[0] = y.astype(y_ref.dtype)


def _res_norm_ref(x, delta, gate, scale, shift, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    df = delta.astype(jnp.float32)
    if gate is not None:
        df = df * gate.astype(jnp.float32)[:, None, :]
    x_new = (xf + df).astype(x.dtype)
    y = _norm_ref(x_new, scale, shift, gamma, beta, rms=False, eps=eps,
                  out_f32=False)
    return x_new, y


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_residual_norm(x, delta, gate, scale, shift, gamma, beta, eps: float):
    """(x + delta * gate, layernorm_fp32(x + delta * gate) modulated).

    One read of x/delta, one write of each output — fuses the residual
    update with the next norm (the two always appear back-to-back in DiT
    blocks).  gate/scale/shift: (B, dim) f32 or None; gamma/beta: (dim,).

    NOTE: wiring this into WanBlock measured ~1% slower e2e than XLA's own
    residual adds (the opaque kernel boundary breaks surrounding fusions),
    so the models keep XLA residuals; the kernel stays available for
    memory-constrained contexts where the saved pass matters more.
    """
    if not _use_pallas(x):
        return _res_norm_ref(x, delta, gate, scale, shift, gamma, beta, eps)
    b, s, dim = x.shape
    rows = _pick_rows(s, dim)
    has_gate = gate is not None
    has_mod = scale is not None
    has_affine = gamma is not None
    has_beta = beta is not None
    kernel = functools.partial(
        _res_kernel, rms=False, eps=float(eps), has_gate=has_gate,
        has_mod=has_mod, has_affine=has_affine, has_beta=has_beta,
    )
    row_spec = pl.BlockSpec((1, rows, dim), lambda bb, ii: (bb, ii, 0))
    vec_b = pl.BlockSpec((1, dim), lambda bb, ii: (bb, 0))
    vec_s = pl.BlockSpec((1, dim), lambda bb, ii: (0, 0))
    in_specs = [row_spec, row_spec]
    inputs = [x, delta]
    if has_gate:
        in_specs.append(vec_b)
        inputs.append(gate.astype(jnp.float32))
    if has_mod:
        in_specs += [vec_b, vec_b]
        inputs += [scale.astype(jnp.float32), shift.astype(jnp.float32)]
    if has_affine:
        in_specs.append(vec_s)
        inputs.append(gamma.astype(jnp.float32).reshape(1, dim))
    if has_beta:
        in_specs.append(vec_s)
        inputs.append(beta.astype(jnp.float32).reshape(1, dim))
    return pl.pallas_call(
        kernel,
        grid=(b, s // rows),
        in_specs=in_specs,
        out_specs=[row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, dim), x.dtype),
            jax.ShapeDtypeStruct((b, s, dim), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(*inputs)


def _frn_fwd(x, delta, gate, scale, shift, gamma, beta, eps):
    out = fused_residual_norm(x, delta, gate, scale, shift, gamma, beta, eps)
    return out, (x, delta, gate, scale, shift, gamma, beta)


def _frn_bwd(eps, res, gs):
    x, delta, gate, scale, shift, gamma, beta = res
    g_xnew, g_y = gs
    xf = x.astype(jnp.float32)
    df = delta.astype(jnp.float32)
    gatef = gate.astype(jnp.float32)[:, None, :] if gate is not None else None
    xn = xf + (df * gatef if gatef is not None else df)
    xn = xn.astype(x.dtype).astype(jnp.float32)  # match forward rounding

    # layernorm backward at xn
    d_x, d_scale, d_shift, d_gamma, d_beta = _fused_norm_bwd(
        False, eps, False, (xn.astype(x.dtype), scale, shift, gamma, beta), g_y
    )
    d_xnew = g_xnew.astype(jnp.float32) + d_x.astype(jnp.float32)
    d_delta = d_xnew * gatef if gatef is not None else d_xnew
    d_gate = (
        jnp.sum(d_xnew * df, axis=1).astype(gate.dtype)
        if gate is not None else None
    )
    return (d_xnew.astype(x.dtype), d_delta.astype(delta.dtype), d_gate,
            d_scale, d_shift, d_gamma, d_beta)


fused_residual_norm.defvjp(_frn_fwd, _frn_bwd)
