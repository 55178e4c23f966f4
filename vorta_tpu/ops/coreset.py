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


def _window_view(x: jax.Array, latent_shape, window):
    """(B, H, S, D) raster -> FREE 9-D view (B, H, T2, wt, H3, wh, W2, ww, D)."""
    b, h, s, d = x.shape
    t, hh, w = latent_shape
    wt, wh, ww = window
    return x.reshape(b, h, t // wt, wt, hh // wh, wh, w // ww, ww, d)


def _onehot_window(onehot: jax.Array, groups: LowresGroups, geom):
    """(B, H, G, U, gs) -> (B, H, T2, wt, H3, wh, W2, ww, U) aligned with the
    window view (small tensor; the only transpose in the pooling path)."""
    b, h, g, u, gs = onehot.shape
    t, hh, w = geom.latent_shape
    wt, wh, ww = geom.window
    oh = onehot.reshape(b, h, t // wt, hh // wh, w // ww, u, wt, wh, ww)
    return oh.transpose(0, 1, 2, 6, 3, 7, 4, 8, 5)


def pool_by_similarity(
    x: jax.Array,
    groups: LowresGroups,
    matching: Optional[Matching] = None,
):
    """Pool ``x`` of shape (B, H, S, D) to (B, H, P, D).

    The pooled sequence is ``[all G centers, then G*U kept margins]`` in
    group-major order, P = G * (1 + U).  Returns ``(pooled, matching)`` so K/V
    can reuse Q's matching.

    All heavy arithmetic runs over a FREE window-shaped view of the raster
    tensor (broadcast-multiply-reduce fusions): the grouping relayout that a
    gather/einsum formulation needs never materializes.  Round 1 measured
    those relayout copies at ~52% of the whole pooling cost (244 GB/s
    effective — XLA transpose), so this is the difference between pooling
    being free and pooling eating the lowres expert's win.
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
    wt, wh, ww = geom.window
    ct, ch, cw = cs // (wh * ww), (cs // ww) % wh, cs % ww

    x6 = _window_view(x, geom.latent_shape, geom.window)
    centers6 = x6[:, :, :, ct, :, ch, :, cw, :]  # (B, H, T2, H3, W2, D)
    centers = centers6.reshape(b, h, g, d)

    if matching is None:
        # Cosine RANKING only needs sim ∝ (c·m)/||m||: the center norm scales
        # every margin of a group equally, so dividing by it cannot change the
        # order.  Upcasts fuse into the multiply-reduce: one bf16-sized read
        # of x, f32 math, no f32 copies.
        xf = x6.astype(jnp.float32)
        cf = centers6.astype(jnp.float32)[:, :, :, None, :, None, :, None, :]
        dot = jnp.sum(xf * cf, axis=-1)  # (B,H,T2,wt,H3,wh,W2,ww)
        sq = jnp.sum(xf * xf, axis=-1)
        sim8 = dot * jax.lax.rsqrt(jnp.maximum(sq, 1e-24))
        # window dims last -> (B, H, G, gs) in slot-raster order (tiny copy)
        sim = sim8.transpose(0, 1, 2, 4, 6, 3, 5, 7).reshape(b, h, g, gs)
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

    # kept-margin extraction as a broadcast-multiply-reduce over the window
    # dims of the free view (0/1 selection, exact in the input dtype)
    oh8 = _onehot_window(matching.onehot.astype(x.dtype), groups, geom)
    kept6 = jnp.sum(
        x6[:, :, :, :, :, :, :, :, None, :] * oh8[..., None],
        axis=(3, 5, 7),
    )  # (B, H, T2, H3, W2, U, D)
    kept_vals = kept6.reshape(b, h, g * u, d)
    pooled = jnp.concatenate([centers, kept_vals], axis=2)
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

    t, hh, w = geom.latent_shape
    wt, wh, ww = geom.window
    centers = pooled[:, :, :g].reshape(b, h, t // wt, hh // wh, w // ww, d)
    kept6 = pooled[:, :, g:].reshape(b, h, t // wt, hh // wh, w // ww, u, d)

    # slot s gets its kept value if selected, else the group center (the
    # center slot itself is never selected, so it gets the center).  All
    # arithmetic is exact 0/1 selection in the input dtype, expressed as a
    # broadcast-multiply-reduce straight into the raster window view — the
    # inverse grouping relayout never materializes (see pool_by_similarity)
    oh8 = _onehot_window(matching.onehot.astype(pooled.dtype), groups, geom)
    kept_b = kept6[:, :, :, None, :, None, :, None, :, :]  # window dims bcast
    slots8 = jnp.sum(oh8[..., None] * kept_b, axis=-2)  # (…, wt,…, ww, D)
    kept_mask8 = jnp.sum(oh8, axis=-1)[..., None]
    centers_b = centers[:, :, :, None, :, None, :, None, :]
    out8 = slots8 + (1 - kept_mask8) * centers_b
    return out8.reshape(b, h, t * hh * w, d)
