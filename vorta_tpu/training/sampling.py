"""Timestep sampling for router distillation training.

Implements the reference's interval-curriculum sampling
(vorta/train/edm_utils.py:67-104): each optimizer step draws uniform u,
squeezes it into one of ``n_intervals`` random sub-intervals of [0, 1], and
in the lowest-noise interval zeroes the diffusion loss while upweighting the
distillation losses.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def renormalize_uniform(
    u: jax.Array, interval_index: jax.Array, n_intervals: int = 5
) -> jax.Array:
    """Map uniform u in [0,1] into interval [k/n, (k+1)/n]."""
    lo = interval_index.astype(jnp.float32) / n_intervals
    hi = (interval_index.astype(jnp.float32) + 1.0) / n_intervals
    return jnp.clip(u * (hi - lo) + lo, lo, hi)


def sample_timesteps(
    key: jax.Array,
    batch: int,
    timestep_table: jax.Array,  # (T,) descending train timesteps (shifted)
    sigma_table: jax.Array,  # (T,) matching sigmas
    n_intervals: int = 5,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (timesteps (B,), sigmas (B,)) via interval-curriculum sampling.

    Matches scripts/wan/train_one_step.py:54-65: uniform u -> one shared
    random interval per step -> index into the scheduler tables.  All ranks
    of an SP group must pass the same key so conditioning lines up (the
    reference broadcasts instead).
    """
    ku, ki = jax.random.split(key)
    u = jax.random.uniform(ku, (batch,))
    interval = jax.random.randint(ki, (), 0, n_intervals)
    u = renormalize_uniform(u, interval, n_intervals)
    n = timestep_table.shape[0]
    idx = jnp.clip((u * n).astype(jnp.int32), 0, n - 1)
    return timestep_table[idx], sigma_table[idx]


def rebalance_loss_weights(
    diffusion_weight: float,
    other_weights: Tuple[float, ...],
    timesteps: jax.Array,
    n_intervals: int = 5,
    num_train_timesteps: int = 1000,
):
    """In the lowest-noise interval, drop the diffusion loss and upweight the
    active distillation losses (vorta/train/edm_utils.py:87-104).  Returns
    traced weights."""
    t0 = timesteps[0]
    in_low = t0 < (num_train_timesteps / n_intervals)
    if diffusion_weight == 0:
        return jnp.float32(0.0), tuple(jnp.float32(w) for w in other_weights)
    num_active = sum(1 for w in other_weights if w > 0)
    boost = 1.0 + 1.0 / max(num_active, 1)
    dw = jnp.where(in_low, 0.0, diffusion_weight)
    ows = tuple(
        jnp.where(in_low, w * boost, w) if w > 0 else jnp.float32(0.0)
        for w in other_weights
    )
    return dw, ows
