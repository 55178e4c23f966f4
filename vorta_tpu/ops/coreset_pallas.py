"""Fused Pallas pooling for the low-resolution attention expert.

The XLA pooling path (ops/coreset.py) re-reads the raster tensors with
strided window access patterns and runs the one-hot selection einsums as
separate fusions — measured ~21 ms for q/k/v pool + unpool at Wan 720p x
12 heads, vs a ~2 ms streaming floor.

This path pools q, k and v in ONE kernel pass over a *slot-major* grouped
layout (gs, G, D): the relayout runs in XLA (window tiling + one transpose
— the only data movement), and the kernel addresses each slot as a plain
leading index — Mosaic rejects both >2-D gathers and sublane-strided
slices (probed on the v5e), so every in-kernel operand is a clean
(Gc, D)/(Gc, gs) 2-D tile.  The matching is computed once from Q and
shared by K/V (reference: wan.py:250-255), or separately from K for
Hunyuan (hunyuan.py:433-438).  The unpool kernel re-derives Q's matching
(identical deterministic arithmetic) and scatters attention outputs back,
dropped slots receiving their group center.

Selection semantics are copied EXACTLY from ops/coreset.py (cosine
ranking by (c.m)/||m||, center sentinel, U iterative arg-min passes, ties
to the lower slot).  Reference: vorta/attention/coreset_select.py:68-185.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import LowresGroups


def _geom(groups: LowresGroups):
    if not hasattr(groups, "_geom"):
        raise ValueError("LowresGroups missing geometry; build via build_lowres_groups")
    return groups._geom  # type: ignore[attr-defined]


def _to_slot_major(x, geom):
    """(B, H, S, D) raster -> (B, H, gs, G, D): one XLA relayout."""
    b, h, s, d = x.shape
    t, hh, w = geom.latent_shape
    wt, wh, ww = geom.window
    x9 = x.reshape(b, h, t // wt, wt, hh // wh, wh, w // ww, ww, d)
    # slot dims (wt, wh, ww) leading, group dims (T2, H3, W2) raster
    x9 = x9.transpose(0, 1, 3, 5, 7, 2, 4, 6, 8)
    gs = wt * wh * ww
    g = (t // wt) * (hh // wh) * (w // ww)
    return x9.reshape(b, h, gs, g, d)


def _from_slot_major(xg, geom):
    b, h, gs, g, d = xg.shape
    t, hh, w = geom.latent_shape
    wt, wh, ww = geom.window
    x9 = xg.reshape(b, h, wt, wh, ww, t // wt, hh // wh, w // ww, d)
    x9 = x9.transpose(0, 1, 5, 2, 6, 3, 7, 4, 8)
    return x9.reshape(b, h, t * hh * w, d)


def _matching_3d(x_all32, gs: int, u: int, cs: int):
    """Per-group kept-margin picks from a (gs, Gc, D) f32 slot-major block.

    Returns a (u, gs, Gc, 1) f32 one-hot pick tensor.  Identical arithmetic
    to ops/coreset.py: cosine RANKING via (c.m)*rsqrt(||m||^2), center
    excluded with a +inf sentinel, u iterative arg-min passes with ties to
    the lower slot index.  All reductions run over the leading slot axis or
    the lane axis — no strided/sublane-split accesses (Mosaic constraint).
    """
    c = x_all32[cs]  # (Gc, D)
    dot = jnp.sum(x_all32 * c[None], axis=-1, keepdims=True)  # (gs, Gc, 1)
    sq = jnp.sum(x_all32 * x_all32, axis=-1, keepdims=True)
    sim = dot * jax.lax.rsqrt(jnp.maximum(sq, 1e-24))  # (gs, Gc, 1)
    inf = jnp.float32(jnp.inf)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0)
    sim = jnp.where(slot_iota == cs, inf, sim)
    picks = []
    for _ in range(u):
        m = jnp.min(sim, axis=0, keepdims=True)
        idx = jnp.min(jnp.where(sim <= m, slot_iota, gs), axis=0, keepdims=True)
        pick = slot_iota == idx  # (gs, Gc, 1) bool
        picks.append(pick.astype(jnp.float32))
        sim = jnp.where(pick, inf, sim)
    return jnp.stack(picks, axis=0)  # (u, gs, Gc, 1)


def _pool_kernel(
    *refs,
    gs, gc, u, cs, kv_from_k: bool, masked: bool,
):
    it = iter(refs)
    active_ref = next(it) if masked else None  # (H,) i32 scalar prefetch
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    qc_ref, qm_ref = next(it), next(it)
    kc_ref, km_ref = next(it), next(it)
    vc_ref, vm_ref = next(it), next(it)

    def body():
        q_all = q_ref[0, 0].astype(jnp.float32)  # (gs, Gc, D)
        k_all = k_ref[0, 0].astype(jnp.float32)
        v_all = v_ref[0, 0].astype(jnp.float32)

        picks_q = _matching_3d(q_all, gs, u, cs)
        picks_kv = _matching_3d(k_all, gs, u, cs) if kv_from_k else picks_q

        def emit(x_all, picks, c_ref, m_ref):
            c_ref[0, 0] = x_all[cs].astype(c_ref.dtype)
            for i in range(u):
                kept = jnp.sum(picks[i] * x_all, axis=0)  # (Gc, D)
                m_ref[0, 0, i] = kept.astype(m_ref.dtype)

        emit(q_all, picks_q, qc_ref, qm_ref)
        emit(k_all, picks_kv, kc_ref, km_ref)
        emit(v_all, picks_kv, vc_ref, vm_ref)

    if not masked:
        body()
        return
    g = pl.program_id(1)

    @pl.when(active_ref[g] > 0)
    def _active():
        body()

    @pl.when(active_ref[g] == 0)
    def _skip():
        # zero-fill so downstream masked attention never sees uninit VMEM
        qc_ref[...] = jnp.zeros_like(qc_ref)
        qm_ref[...] = jnp.zeros_like(qm_ref)
        kc_ref[...] = jnp.zeros_like(kc_ref)
        km_ref[...] = jnp.zeros_like(km_ref)
        vc_ref[...] = jnp.zeros_like(vc_ref)
        vm_ref[...] = jnp.zeros_like(vm_ref)


def _unpool_kernel(
    *refs,
    gs, gc, u, cs, masked: bool,
):
    it = iter(refs)
    active_ref = next(it) if masked else None
    q_ref, c_ref, m_ref, out_ref = next(it), next(it), next(it), next(it)

    def body():
        q_all = q_ref[0, 0].astype(jnp.float32)
        picks = _matching_3d(q_all, gs, u, cs)  # (u, gs, Gc, 1)

        centers = c_ref[0, 0].astype(jnp.float32)  # (Gc, D)
        kept = m_ref[0, 0].astype(jnp.float32)  # (u, Gc, D)
        val = jnp.zeros((gs,) + centers.shape, jnp.float32)
        mask = jnp.zeros((gs, centers.shape[0], 1), jnp.float32)
        for i in range(u):
            val = val + picks[i] * kept[i][None]
            mask = mask + picks[i]
        val = val + (1.0 - mask) * centers[None]
        out_ref[0, 0] = val.astype(out_ref.dtype)

    if not masked:
        body()
        return
    g = pl.program_id(1)

    @pl.when(active_ref[g] > 0)
    def _active():
        body()

    @pl.when(active_ref[g] == 0)
    def _skip():
        out_ref[...] = jnp.zeros_like(out_ref)


def _shapes(x, groups: LowresGroups):
    geom = _geom(groups)
    t, hh, w = geom.latent_shape
    wt, wh, ww = geom.window
    b, h, s, d = x.shape
    if s != t * hh * w:
        raise ValueError(f"seq len {s} != prod(latent_shape) {geom.latent_shape}")
    return geom, (t, hh, w), (wt, wh, ww), (b, h, d)


def _cell_split(g: int, gs: int, d: int, itemsize: int) -> int:
    """Groups per grid cell, bounding the 3-tensor VMEM block near ~8 MB;
    8-aligned so the (Gc, D) tiles stay clean (full g as fallback)."""
    budget = max(8, 8 * 2**20 // (3 * gs * d * max(itemsize, 2)))
    for gc in range(min(g, budget), 7, -1):
        if g % gc == 0 and gc % 8 == 0:
            return gc
    return g


def pool_qkv(
    q: jax.Array, k: jax.Array, v: jax.Array, groups: LowresGroups,
    *, kv_matching_from_k: bool = False, active: Optional[jax.Array] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pool (B,H,S,D) q/k/v to (B,H,P,D) in one fused kernel pass.

    Pooled layout matches ops/coreset.py: [all G centers | all G*U kept
    margins], group-major, margins least-similar-first.

    ``active``: optional (H,) participation mask — inactive heads skip all
    matching/selection compute and emit zeros (their rows are expected to
    be masked out of the downstream pooled attention anyway).
    """
    geom, _, _, (b, h, d) = _shapes(q, groups)
    u = groups.num_kept_margins
    g = groups.num_groups
    gs = groups.group_size
    cs = geom.center_slot
    gc = _cell_split(g, gs, d, q.dtype.itemsize)
    n_cells = g // gc
    masked = active is not None

    kernel = functools.partial(
        _pool_kernel, gs=gs, gc=gc, u=u, cs=cs, kv_from_k=kv_matching_from_k,
        masked=masked,
    )

    def in_map(bb, hh_, i, *refs):
        return (bb, hh_, 0, i, 0)

    def c_map(bb, hh_, i, *refs):
        return (bb, hh_, i, 0)

    qg = _to_slot_major(q, geom)
    kg = _to_slot_major(k, geom)
    vg = _to_slot_major(v, geom)

    out_shapes, out_specs = [], []
    for _ in range(3):
        out_shapes += [
            jax.ShapeDtypeStruct((b, h, g, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, u, g, d), q.dtype),  # slot-major kept
        ]
        out_specs += [
            pl.BlockSpec((1, 1, gc, d), c_map),
            pl.BlockSpec((1, 1, u, gc, d), in_map),
        ]

    in_specs = [pl.BlockSpec((1, 1, gs, gc, d), in_map)] * 3
    if masked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, n_cells),
            in_specs=in_specs,
            out_specs=out_specs,
        )
        call_args = (active.astype(jnp.int32), qg, kg, vg)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(b, h, n_cells),
            in_specs=in_specs,
            out_specs=out_specs,
        )
        call_args = (qg, kg, vg)

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(*call_args)

    def finish(c, m):
        # (B,H,U,G,D) slot-major kept -> group-major (B,H,G*U,D)
        mm = m.transpose(0, 1, 3, 2, 4).reshape(b, h, g * u, d)
        return jnp.concatenate([c, mm], axis=2)

    qc, qm, kc, km, vc, vm = outs
    return finish(qc, qm), finish(kc, km), finish(vc, vm)


def unpool(
    pooled_out: jax.Array, q: jax.Array, groups: LowresGroups,
    *, active: Optional[jax.Array] = None, interpret: bool = False,
) -> jax.Array:
    """Scatter a pooled (B,H,P,D) attention output back to (B,H,S,D),
    re-deriving Q's matching in-kernel (bitwise-identical arithmetic).

    ``active``: optional (H,) participation mask — inactive heads skip the
    matching compute and write zeros."""
    geom, _, _, (b, h, d) = _shapes(q, groups)
    u = groups.num_kept_margins
    g = groups.num_groups
    gs = groups.group_size
    cs = geom.center_slot
    gc = _cell_split(g, gs, d, q.dtype.itemsize)
    n_cells = g // gc
    masked = active is not None

    kernel = functools.partial(
        _unpool_kernel, gs=gs, gc=gc, u=u, cs=cs, masked=masked,
    )
    centers = pooled_out[:, :, :g]
    kept = (
        pooled_out[:, :, g:]
        .reshape(b, h, g, u, d)
        .transpose(0, 1, 3, 2, 4)  # slot-major kept for plain leading index
    )
    qg = _to_slot_major(q, geom)

    def in_map(bb, hh_, i, *refs):
        return (bb, hh_, 0, i, 0)

    def c_map(bb, hh_, i, *refs):
        return (bb, hh_, i, 0)

    in_specs = [
        pl.BlockSpec((1, 1, gs, gc, d), in_map),
        pl.BlockSpec((1, 1, gc, d), c_map),
        pl.BlockSpec((1, 1, u, gc, d), in_map),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1 if masked else 0,
        grid=(b, h, n_cells),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, gs, gc, d), in_map),
    )
    call_args = (qg, centers, kept)
    if masked:
        call_args = (active.astype(jnp.int32),) + call_args

    out_sm = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, gs, g, d), pooled_out.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(*call_args)
    return _from_slot_major(out_sm, geom)
