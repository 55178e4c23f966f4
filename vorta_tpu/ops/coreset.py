"""Similarity-based sequence pooling for the low-resolution attention expert.

The low-res expert compresses the video token sequence by keeping, per
non-overlapping 3D window ("group"), the center token plus the margin tokens
*least* cosine-similar to the center; attention runs on the short sequence and
the output is scattered back, with dropped positions receiving their group
center's output (reference: vorta/attention/coreset_select.py:68-185).

TPU formulation: XLA gathers/scatters are slow on TPU, so everything is
expressed as relayout + MXU work instead:
  * group extraction is a static window relayout (reshape/transpose — the
    same machinery as tile layout), not an index gather;
  * the kept-margin selection is ``lax.top_k`` of negative similarity plus a
    one-hot matrix, and both the kept-gather and the unpool-scatter become
    batched einsums against that one-hot (dropped slots get the center via
    the one-hot's complement).
All shapes are static; selection indices (``Matching``) are computed once
from Q and reused for K/V (reference: wan.py:250-255).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..geometry import LowresGroups


class Matching(NamedTuple):
    """Per-(batch, head, group) kept-margin selection from the similarity sort.

    ``kept`` indexes the margin-slot axis (0..M-1), ascending by cosine
    similarity to the center (least similar first); ``onehot`` is the
    (B, H, G, U, group_size) one-hot expansion over GROUP slots (center slot
    never selected), shared by pool and unpool.  Stored in the input dtype:
    0/1 values are exact in bf16 and the selection einsums accumulate in f32,
    so no f32 copies of the (big) grouped tensors are ever materialized.
    """

    kept: jax.Array  # (B, H, G, U) int32 — margin-axis indices
    onehot: jax.Array  # (B, H, G, U, group_size)


def _group_layout(x: jax.Array, groups: LowresGroups, window_shape, latent_shape):
    """(B, H, S, D) raster -> (B, H, G, group_size, D) via static relayout."""
    from .layout import tile_sequence

    b, h, s, d = x.shape
    grouped = tile_sequence(x, latent_shape, window_shape)
    return grouped.reshape(b, h, groups.num_groups, groups.group_size, d)


def _ungroup_layout(x: jax.Array, groups: LowresGroups, window_shape, latent_shape):
    from .layout import untile_sequence

    b, h, g, gs, d = x.shape
    return untile_sequence(x.reshape(b, h, g * gs, d), latent_shape, window_shape)


def _geometry(groups: LowresGroups):
    # recover (latent_shape, window, center_slot) from the group indices:
    # groups.center/margins were built by build_lowres_groups so the window
    # relayout reproduces them exactly; we stash shapes on the object
    if not hasattr(groups, "_geom"):
        raise ValueError("LowresGroups missing geometry; build via build_lowres_groups")
    return groups._geom  # type: ignore[attr-defined]


def pool_by_similarity(
    x: jax.Array,
    groups: LowresGroups,
    matching: Optional[Matching] = None,
):
    """Pool ``x`` of shape (B, H, S, D) to (B, H, P, D).

    The pooled sequence is ``[all G centers, then G*U kept margins]`` in
    group-major order, P = G * (1 + U).  Returns ``(pooled, matching)`` so K/V
    can reuse Q's matching.
    """
    if x.shape[-2] != groups.full_length:
        raise ValueError(
            f"sequence length {x.shape[-2]} != groups.full_length {groups.full_length}"
        )
    geom = _geometry(groups)
    b, h, _, d = x.shape
    g = groups.num_groups
    u = groups.num_kept_margins
    gs = groups.group_size
    cs = geom.center_slot

    grouped = _group_layout(x, groups, geom.window, geom.latent_shape)
    centers = grouped[..., cs, :]  # (B, H, G, D)

    if matching is None:
        # Cosine RANKING only needs sim ∝ (c·m)/||m||: the center norm scales
        # every margin of a group equally, so dividing by it cannot change the
        # order.  Two einsums with f32 accumulation — the grouped tensor is
        # read twice but never cast/copied to f32.
        dot = jnp.einsum(
            "bhgd,bhgsd->bhgs", centers, grouped, preferred_element_type=jnp.float32
        )
        sq = jnp.einsum(
            "bhgsd,bhgsd->bhgs", grouped, grouped, preferred_element_type=jnp.float32
        )
        sim = dot * jax.lax.rsqrt(jnp.maximum(sq, 1e-24))
        # center excluded from selection: most-similar sentinel sorts it last
        sim = sim.at[..., cs].set(jnp.inf)
        # least-similar-first selection via U iterative arg-min passes over
        # the tiny slot axis (ties -> lower slot, same as lax.top_k(-sim));
        # measurably cheaper than top_k's general sort at G ~ thousands
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, sim.shape, sim.ndim - 1)
        picks, idxs = [], []
        for _ in range(u):
            m = jnp.min(sim, axis=-1, keepdims=True)
            idx = jnp.min(
                jnp.where(sim <= m, slot_iota, gs), axis=-1, keepdims=True
            )
            pick = slot_iota == idx
            picks.append(pick)
            idxs.append(idx)
            sim = jnp.where(pick, jnp.inf, sim)
        kept_slots = jnp.concatenate(idxs, axis=-1)  # (B,H,G,U)
        kept = (kept_slots - (kept_slots > cs)).astype(jnp.int32)  # margin axis
        onehot = jnp.stack(picks, axis=-2).astype(x.dtype)  # (B,H,G,U,gs)
        matching = Matching(kept=kept, onehot=onehot)

    kept_vals = jnp.einsum(
        "bhgus,bhgsd->bhgud",
        matching.onehot.astype(x.dtype),
        grouped,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    pooled = jnp.concatenate([centers, kept_vals.reshape(b, h, g * u, d)], axis=2)
    return pooled, matching


def unpool_by_similarity(
    pooled: jax.Array,
    groups: LowresGroups,
    matching: Matching,
) -> jax.Array:
    """Scatter a pooled (B, H, P, D) sequence back to (B, H, S, D).

    Kept positions receive their own pooled value; dropped positions receive
    their group center's value.
    """
    geom = _geometry(groups)
    b, h, p, d = pooled.shape
    g = groups.num_groups
    u = groups.num_kept_margins
    if p != groups.pooled_length:
        raise ValueError(f"pooled length {p} != expected {groups.pooled_length}")

    centers = pooled[:, :, :g]  # (B, H, G, D)
    kept_vals = pooled[:, :, g:].reshape(b, h, g, u, d)
    onehot = matching.onehot.astype(pooled.dtype)

    # slot s gets its kept value if selected, else the group center (the
    # center slot itself is never selected, so it gets the center).  All
    # arithmetic is exact 0/1 selection, safe in the input dtype — no f32
    # copies of the full-length tensor
    slots = jnp.einsum("bhgus,bhgud->bhgsd", onehot, kept_vals)
    kept_mask = jnp.sum(onehot, axis=-2)[..., None]  # (B,H,G,gs,1)
    grouped = slots + (1 - kept_mask) * centers[:, :, :, None, :]
    out = _ungroup_layout(grouped, groups, geom.window, geom.latent_shape)
    return out
