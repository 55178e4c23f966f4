"""Shared model building blocks (Flax NNX).

Numerics follow the reference stack: LayerNorms run in float32 regardless of
activation dtype (diffusers FP32LayerNorm semantics), RMSNorm for qk-norm is
applied across the full projected dim before head split ("rms_norm_across_heads"),
and the timestep embedding is the flip_sin_to_cos sinusoid used by diffusers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx


class FP32LayerNorm(nnx.Module):
    """LayerNorm computed in f32, output cast back to the input dtype."""

    def __init__(self, dim: int, eps: float = 1e-6, affine: bool = False, *, rngs: nnx.Rngs):
        self.eps = eps
        self.affine = affine
        if affine:
            self.scale = nnx.Param(jnp.ones((dim,), jnp.float32))
            self.bias = nnx.Param(jnp.zeros((dim,), jnp.float32))

    def __call__(self, x: jax.Array) -> jax.Array:
        # plain (unmodulated) norm stays in XLA: its bf16 output fuses into
        # the consumer, which measured faster than an opaque kernel boundary
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            out = out * self.scale[None] + self.bias[None]
        return out.astype(x.dtype)

    def fp32(self, x: jax.Array) -> jax.Array:
        """Same normalization but keep the f32 result (for AdaLN modulation)."""
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            out = out * self.scale[None] + self.bias[None]
        return out

    def modulated(self, x: jax.Array, scale: jax.Array, shift: jax.Array) -> jax.Array:
        """Fused ``norm(x) * (1 + scale) + shift`` -> x.dtype (AdaLN).

        scale/shift: (B, dim) f32.  One read+write pass on TPU (Pallas);
        identical math to ``fp32(x) * (1+scale[:,None]) + shift[:,None]``."""
        from ..ops.fused_norm import fused_norm

        gamma = self.scale[...] if self.affine else None
        beta = self.bias[...] if self.affine else None
        return fused_norm(x, scale, shift, gamma, beta, False, self.eps, False)


class RMSNorm(nnx.Module):
    """RMSNorm with learnable gain, computed in f32."""

    def __init__(self, dim: int, eps: float = 1e-6, *, rngs: nnx.Rngs):
        self.eps = eps
        self.weight = nnx.Param(jnp.ones((dim,), jnp.float32))

    def __call__(self, x: jax.Array) -> jax.Array:
        # stays in XLA: a fused Pallas RMSNorm here measured ~2% slower e2e
        # (the kernel boundary between the qkv projections and the head
        # split breaks XLA's fusions, same as the residual-add experiment)
        xf = x.astype(jnp.float32)
        rms = jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + self.eps)
        return (xf * rms * self.weight[None]).astype(x.dtype)


def sinusoidal_timestep_embedding(
    t: jax.Array,
    dim: int,
    max_period: float = 10000.0,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
) -> jax.Array:
    """diffusers get_timestep_embedding semantics. t: (B,) float/int -> (B, dim)."""
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nnx.Module):
    """linear -> silu -> linear on the sinusoid (diffusers TimestepEmbedding)."""

    def __init__(self, in_dim: int, dim: int, *, dtype=jnp.float32, param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.linear_1 = nnx.Linear(in_dim, dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.linear_2 = nnx.Linear(dim, dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.linear_2(jax.nn.silu(self.linear_1(x)))


class GELUFeedForward(nnx.Module):
    """linear -> tanh-approx gelu -> linear (diffusers FeedForward 'gelu-approximate').

    Projections are QLinear: identical params to nnx.Linear, but obey the
    ops.qmm.mm_precision() context (opt-in int8 serving mode)."""

    def __init__(self, dim: int, inner_dim: int, *, dtype=jnp.float32, param_dtype=jnp.float32, rngs: nnx.Rngs, site_prefix=None):
        from ..ops.qmm import QLinear

        def site(name):
            return f"{site_prefix}.{name}" if site_prefix else None

        self.proj_in = QLinear(dim, inner_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs, site=site("proj_in"))
        self.proj_out = QLinear(inner_dim, dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs, site=site("proj_out"))

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.proj_out(jax.nn.gelu(self.proj_in(x), approximate=True))


class TextProjection(nnx.Module):
    """linear -> tanh gelu -> linear (diffusers PixArtAlphaTextProjection)."""

    def __init__(self, in_dim: int, dim: int, *, dtype=jnp.float32, param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.linear_1 = nnx.Linear(in_dim, dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.linear_2 = nnx.Linear(dim, dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.linear_2(jax.nn.gelu(self.linear_1(x), approximate=True))
