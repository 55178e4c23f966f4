"""Fused Pallas pooling for the low-resolution attention expert.

The XLA pooling path (ops/coreset.py) re-reads the raster tensors with
strided window access patterns and runs the one-hot selection einsums as
separate fusions — measured ~21 ms for q/k/v pool + unpool at Wan 720p x
12 heads, vs a ~2 ms streaming floor.

This path pools q, k and v in ONE kernel pass over the *group-major*
layout: the window relayout runs in XLA (ops/layout.tile_sequence — the
only data movement), then each grid cell holds a contiguous (Gc*gs, D)
block of all three tensors in VMEM and does similarity + selection +
extraction with pure 2-D operations (Mosaic supports 2-D strided row
slices; any >2-D view with the small group dims in sublane position
forces unsupported gathers — probed on the v5e).  The matching is
computed once from Q and shared by K/V (reference: wan.py:250-255), or
separately from K for Hunyuan (hunyuan.py:433-438).  The unpool kernel
re-derives Q's matching (identical deterministic arithmetic) and scatters
attention outputs back, dropped slots receiving their group center.

Selection semantics are copied EXACTLY from ops/coreset.py (cosine
ranking by (c.m)/||m||, center sentinel, U iterative arg-min passes, ties
to the lower slot).  Reference: vorta/attention/coreset_select.py:68-185.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import LowresGroups
from .layout import tile_sequence, untile_sequence


def _geom(groups: LowresGroups):
    if not hasattr(groups, "_geom"):
        raise ValueError("LowresGroups missing geometry; build via build_lowres_groups")
    return groups._geom  # type: ignore[attr-defined]


def _slots(x2, gs: int):
    """(Gc*gs, D) group-major block -> list of gs (Gc, D) slot slices
    (2-D strided row slices — the Mosaic-supported access pattern)."""
    return [x2[s::gs, :] for s in range(gs)]


def _matching_2d(slots32, gs: int, u: int, cs: int):
    """Per-group kept-margin picks from 2-D slot slices.

    Returns u lists of gs (Gc, 1) f32 one-hot column masks.  Identical
    arithmetic to ops/coreset.py: cosine RANKING via (c.m)*rsqrt(||m||^2),
    center excluded with a +inf sentinel, u iterative arg-min passes with
    ties to the lower slot index.
    """
    c = slots32[cs]  # (Gc, D)
    sims = []
    for s in range(gs):
        x = slots32[s]
        dot = jnp.sum(x * c, axis=-1, keepdims=True)
        sq = jnp.sum(x * x, axis=-1, keepdims=True)
        sims.append(dot * jax.lax.rsqrt(jnp.maximum(sq, 1e-24)))
    sim = jnp.concatenate(sims, axis=1)  # (Gc, gs)
    inf = jnp.float32(jnp.inf)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    sim = jnp.where(slot_iota == cs, inf, sim)
    picks = []
    for _ in range(u):
        m = jnp.min(sim, axis=-1, keepdims=True)
        idx = jnp.min(jnp.where(sim <= m, slot_iota, gs), axis=-1, keepdims=True)
        pick = slot_iota == idx  # (Gc, gs) bool
        picks.append([pick[:, s : s + 1].astype(jnp.float32) for s in range(gs)])
        sim = jnp.where(pick, inf, sim)
    return picks


def _pool_kernel(
    q_ref, k_ref, v_ref,
    qc_ref, qm_ref, kc_ref, km_ref, vc_ref, vm_ref,
    *, gs, gc, u, cs, kv_from_k: bool,
):
    qs = _slots(q_ref[0, 0], gs)
    ks = _slots(k_ref[0, 0], gs)
    vs = _slots(v_ref[0, 0], gs)

    picks_q = _matching_2d([s.astype(jnp.float32) for s in qs], gs, u, cs)
    picks_kv = (
        _matching_2d([s.astype(jnp.float32) for s in ks], gs, u, cs)
        if kv_from_k else picks_q
    )

    d = q_ref.shape[-1]

    def emit(slots, picks, c_ref, m_ref):
        c_ref[0, 0] = slots[cs].astype(c_ref.dtype)
        for i, pick in enumerate(picks):
            kept = jnp.zeros((gc, d), jnp.float32)
            for s in range(gs):
                kept = kept + pick[s] * slots[s].astype(jnp.float32)
            m_ref[0, 0, i::u, :] = kept.astype(m_ref.dtype)

    emit(qs, picks_q, qc_ref, qm_ref)
    emit(ks, picks_kv, kc_ref, km_ref)
    emit(vs, picks_kv, vc_ref, vm_ref)


def _unpool_kernel(
    q_ref, c_ref, m_ref, out_ref,
    *, gs, gc, u, cs,
):
    qs = _slots(q_ref[0, 0], gs)
    picks = _matching_2d([s.astype(jnp.float32) for s in qs], gs, u, cs)

    centers = c_ref[0, 0].astype(jnp.float32)  # (Gc, D)
    kept = [m_ref[0, 0, i::u, :].astype(jnp.float32) for i in range(u)]
    for s in range(gs):
        val = jnp.zeros_like(centers)
        mask = jnp.zeros((gc, 1), jnp.float32)
        for i in range(u):
            val = val + picks[i][s] * kept[i]
            mask = mask + picks[i][s]
        val = val + (1.0 - mask) * centers
        out_ref[0, 0, s::gs, :] = val.astype(out_ref.dtype)


def _shapes(x, groups: LowresGroups):
    geom = _geom(groups)
    t, hh, w = geom.latent_shape
    wt, wh, ww = geom.window
    b, h, s, d = x.shape
    if s != t * hh * w:
        raise ValueError(f"seq len {s} != prod(latent_shape) {geom.latent_shape}")
    return geom, (t, hh, w), (wt, wh, ww), (b, h, d)


def _cell_split(g: int, gs: int, d: int, itemsize: int) -> int:
    """Groups per grid cell: bound the 3-tensor VMEM block near ~8 MB.
    All output block row counts (gc, gc*u, gc*gs) must be 8-aligned, so gc
    is the largest divisor of g that is a multiple of 8 (falling back to
    the full g when none exists — tiny test geometries)."""
    budget = max(8, 8 * 2**20 // (3 * gs * d * max(itemsize, 2)))
    best = g
    for gc in range(min(g, budget), 7, -1):
        if g % gc == 0 and gc % 8 == 0:
            best = gc
            break
    return best


def pool_qkv(
    q: jax.Array, k: jax.Array, v: jax.Array, groups: LowresGroups,
    *, kv_matching_from_k: bool = False, interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pool (B,H,S,D) q/k/v to (B,H,P,D) in one fused kernel pass.

    Pooled layout matches ops/coreset.py: [all G centers | all G*U kept
    margins], group-major, margins least-similar-first.
    """
    geom, (t, hh, w), (wt, wh, ww), (b, h, d) = _shapes(q, groups)
    u = groups.num_kept_margins
    g = groups.num_groups
    gs = groups.group_size
    cs = geom.center_slot
    gc = _cell_split(g, gs, d, q.dtype.itemsize)
    n_cells = g // gc

    kernel = functools.partial(
        _pool_kernel, gs=gs, gc=gc, u=u, cs=cs, kv_from_k=kv_matching_from_k,
    )

    def in_map(bb, hh_, i):
        return (bb, hh_, i, 0)

    qg = tile_sequence(q, geom.latent_shape, geom.window)
    kg = tile_sequence(k, geom.latent_shape, geom.window)
    vg = tile_sequence(v, geom.latent_shape, geom.window)

    out_shapes, out_specs = [], []
    for _ in range(3):
        out_shapes += [
            jax.ShapeDtypeStruct((b, h, g, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, g * u, d), q.dtype),
        ]
        out_specs += [
            pl.BlockSpec((1, 1, gc, d), in_map),
            pl.BlockSpec((1, 1, gc * u, d), in_map),
        ]

    outs = pl.pallas_call(
        kernel,
        grid=(b, h, n_cells),
        in_specs=[pl.BlockSpec((1, 1, gc * gs, d), in_map)] * 3,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(qg, kg, vg)
    qc, qm, kc, km, vc, vm = outs
    pq = jnp.concatenate([qc, qm], axis=2)
    pk = jnp.concatenate([kc, km], axis=2)
    pv = jnp.concatenate([vc, vm], axis=2)
    return pq, pk, pv


def unpool(
    pooled_out: jax.Array, q: jax.Array, groups: LowresGroups,
    *, interpret: bool = False,
) -> jax.Array:
    """Scatter a pooled (B,H,P,D) attention output back to (B,H,S,D),
    re-deriving Q's matching in-kernel (bitwise-identical arithmetic)."""
    geom, (t, hh, w), (wt, wh, ww), (b, h, d) = _shapes(q, groups)
    u = groups.num_kept_margins
    g = groups.num_groups
    gs = groups.group_size
    cs = geom.center_slot
    gc = _cell_split(g, gs, d, q.dtype.itemsize)
    n_cells = g // gc

    kernel = functools.partial(_unpool_kernel, gs=gs, gc=gc, u=u, cs=cs)
    centers = pooled_out[:, :, :g]
    kept = pooled_out[:, :, g:]
    qg = tile_sequence(q, geom.latent_shape, geom.window)

    def in_map(bb, hh_, i):
        return (bb, hh_, i, 0)

    out_g = pl.pallas_call(
        kernel,
        grid=(b, h, n_cells),
        in_specs=[
            pl.BlockSpec((1, 1, gc * gs, d), in_map),
            pl.BlockSpec((1, 1, gc, d), in_map),
            pl.BlockSpec((1, 1, gc * u, d), in_map),
        ],
        out_specs=pl.BlockSpec((1, 1, gc * gs, d), in_map),
        out_shape=jax.ShapeDtypeStruct((b, h, g * gs, d), pooled_out.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(qg, centers, kept)
    return untile_sequence(out_g, geom.latent_shape, geom.window)
