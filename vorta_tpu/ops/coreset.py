"""Similarity-based sequence pooling for the low-resolution attention expert.

The low-res expert compresses the video token sequence by keeping, per
non-overlapping 3D window ("group"), the center token plus the margin tokens
*least* cosine-similar to the center; attention runs on the short sequence and
the output is scattered back, with dropped positions receiving their group
center's output (reference: vorta/attention/coreset_select.py:68-185).

TPU notes: all shapes are static (the kept/dropped split sizes come from
config, not data), so this lowers to einsum + argsort + gathers + one batched
scatter — no dynamic shapes, no host sync.  The selection indices
(``Matching``) are computed once from Q and reused for K and V so all three
are pooled consistently (reference: wan.py:250-255).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..geometry import LowresGroups


class Matching(NamedTuple):
    """Per-(batch, head, group) margin ordering from the similarity sort.

    ``kept``/``dropped`` index into the *margin slot* axis (0..M-1) of each
    group, ascending by cosine similarity to the center: kept = least similar.
    """

    kept: jax.Array  # (B, H, G, U) int32
    dropped: jax.Array  # (B, H, G, M - U) int32


def _l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    # torch.nn.functional.normalize semantics: x / max(||x||, eps)
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


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
    b, h, _, d = x.shape
    g = groups.num_groups
    u = groups.num_kept_margins

    centers = jnp.take(x, jnp.asarray(groups.center), axis=2)  # (B, H, G, D)
    margins = jnp.take(x, jnp.asarray(groups.margins.reshape(-1)), axis=2)
    margins = margins.reshape(b, h, g, -1, d)  # (B, H, G, M, D)

    if matching is None:
        sim = jnp.einsum(
            "bhgd,bhgmd->bhgm",
            _l2_normalize(centers.astype(jnp.float32)),
            _l2_normalize(margins.astype(jnp.float32)),
        )
        order = jnp.argsort(sim, axis=-1)  # ascending: least similar first
        matching = Matching(kept=order[..., :u], dropped=order[..., u:])

    kept = jnp.take_along_axis(margins, matching.kept[..., None], axis=-2)
    pooled = jnp.concatenate([centers, kept.reshape(b, h, g * u, d)], axis=2)
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
    b, h, p, d = pooled.shape
    g = groups.num_groups
    u = groups.num_kept_margins
    if p != groups.pooled_length:
        raise ValueError(f"pooled length {p} != expected {groups.pooled_length}")

    centers = pooled[:, :, :g]  # (B, H, G, D)
    kept_vals = pooled[:, :, g:].reshape(b, h, g, u, d)

    margins = jnp.asarray(groups.margins)[None, None]  # (1, 1, G, M)
    kept_pos = jnp.take_along_axis(
        jnp.broadcast_to(margins, (b, h, g, margins.shape[-1])), matching.kept, axis=-1
    )  # (B, H, G, U)
    drop_pos = jnp.take_along_axis(
        jnp.broadcast_to(margins, (b, h, g, margins.shape[-1])), matching.dropped, axis=-1
    )  # (B, H, G, M-U)

    n_drop = drop_pos.shape[-1]
    drop_vals = jnp.broadcast_to(centers[:, :, :, None, :], (b, h, g, n_drop, d))

    center_pos = jnp.broadcast_to(
        jnp.asarray(groups.center)[None, None, :], (b, h, g)
    )

    # Positions partition [0, S): one combined scatter.
    all_pos = jnp.concatenate(
        [center_pos, kept_pos.reshape(b, h, -1), drop_pos.reshape(b, h, -1)], axis=-1
    )  # (B, H, S)
    all_vals = jnp.concatenate(
        [centers, kept_vals.reshape(b, h, -1, d), drop_vals.reshape(b, h, -1, d)], axis=2
    )  # (B, H, S, D)

    out = jnp.zeros((b, h, groups.full_length, d), dtype=pooled.dtype)
    bi = jnp.arange(b)[:, None, None]
    hi = jnp.arange(h)[None, :, None]
    return out.at[bi, hi, all_pos].set(all_vals, mode="drop", unique_indices=True)
