"""Step-level residual caching for diffusion sampling (TeaCache family).

The reference's 14.4x headline is VORTA *combined with other acceleration
methods* (arXiv 2505.18809 abstract); the dominant class of such methods is
step caching: across adjacent denoise steps the DiT's output changes slowly,
so when an inexpensive indicator says the change is small, the transformer
block stack is skipped and the previous step's *block residual*
(``hidden_out - hidden_in``) is reused.  Patch embedding and the output head
still run every step, so the integrator keeps its identity path through the
current latents — only the block-stack delta is approximated.

TPU-native formulation: the whole decision is traced data inside the jit'd
denoise ``lax.scan`` — a ``lax.cond`` either runs the block scan or applies
the cached residual; both branches have identical shapes, so one compiled
program serves every step.  No host round-trips, no dynamic shapes.

Indicator: the flattened AdaLN modulation tensor (temb6 for Wan, temb for
Hunyuan) — the timestep-embedding signal TeaCache uses for these models.
Its step-to-step relative L1 distance accumulates; once the accumulator
crosses ``threshold`` the blocks run and the accumulator resets.  An
optional fitted polynomial rescales the raw distance (TeaCache's
coefficients; identity by default since no pretrained weights ship in this
environment — fit with tools/fit_cache_poly.py once real checkpoints exist).

Reference analog: none in wenhao728/VORTA (it composes with external
cachers); this is a first-class subsystem here because the north-star
target is the *combined* speedup.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp


class StepCache(NamedTuple):
    """Carried across denoise steps (a pytree of arrays; scan/cond safe)."""

    prev_ind: jax.Array  # (B, K) f32 — previous step's indicator
    residual: jax.Array  # (B, S, D) model dtype — cached block-stack delta
    acc: jax.Array  # () f32 — accumulated rescaled distance since last compute
    valid: jax.Array  # () bool — False until the first computed step


def init_step_cache(batch: int, seq: int, dim: int, ind_dim: int,
                    dtype=jnp.bfloat16) -> StepCache:
    return StepCache(
        prev_ind=jnp.zeros((batch, ind_dim), jnp.float32),
        residual=jnp.zeros((batch, seq, dim), dtype),
        acc=jnp.zeros((), jnp.float32),
        valid=jnp.zeros((), bool),
    )


def rel_l1(cur: jax.Array, prev: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Mean relative L1 distance between two indicator tensors -> () f32.

    The reduction spans the whole batch: one scalar decision covers every
    sample (and, under ``cfg_batch``, both CFG arms — their indicators are
    averaged into one distance).  This is intentional: the skip is a scalar
    ``lax.cond`` so the compute is actually elided; a per-sample decision
    would need a masked ``where``-style replay that still runs the blocks.
    Serving batches are B=1 per arm here (matching the reference's batch-1
    assert, hunyuan.py:168); for multi-sample batched serving the blended
    decision is a conservative average, not per-sample optimal.
    """
    cur = cur.astype(jnp.float32)
    prev = prev.astype(jnp.float32)
    return jnp.mean(jnp.abs(cur - prev)) / (jnp.mean(jnp.abs(prev)) + eps)


def rescale(d: jax.Array, coefficients: Optional[Sequence[float]]) -> jax.Array:
    """Polynomial rescale of the raw indicator distance (highest degree
    first, numpy.polyval convention).  None -> identity."""
    if not coefficients:
        return d
    out = jnp.zeros((), jnp.float32)
    for c in coefficients:
        out = out * d + jnp.float32(c)
    return out


def cache_decision(
    cache: StepCache,
    indicator: jax.Array,  # (B, K)
    threshold: float,
    force_compute: Optional[jax.Array] = None,  # () bool
    coefficients: Optional[Sequence[float]] = None,
):
    """Returns ``(skip, acc_if_skipped)``.

    ``skip`` is a traced () bool: True when the accumulated (rescaled)
    indicator distance stays under ``threshold`` and nothing forces a
    compute.  When the caller runs the blocks it must reset ``acc`` to 0;
    when it skips it carries ``acc_if_skipped``.
    """
    # Clamp at zero: an unconstrained fitted polynomial (np.polyfit) can go
    # negative for some indicator distances, which would let acc decrease and
    # skips continue indefinitely between forced steps.  Accumulation is
    # monotone by intent.
    d = jnp.maximum(rescale(rel_l1(indicator, cache.prev_ind), coefficients),
                    jnp.float32(0.0))
    acc = cache.acc + d
    skip = cache.valid & (acc < jnp.float32(threshold))
    if force_compute is not None:
        skip = skip & jnp.logical_not(force_compute)
    return skip, acc
