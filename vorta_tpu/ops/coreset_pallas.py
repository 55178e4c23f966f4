"""Fused Pallas pooling for the low-resolution attention expert.

The XLA pooling path (ops/coreset.py) re-reads the raster tensors with
strided window access patterns and runs the one-hot selection einsums as
separate fusions — measured ~21 ms for q/k/v pool + unpool at Wan 720p x
12 heads.  A first fused kernel that consumed an XLA-relaid slot-major
(gs, G, D) copy measured 18.7 ms, 7.3 ms of which was the 9-d relayout
transpose itself (256-byte gather runs, ~180 GB/s).

This version reads the RASTER tensors directly — no relayout copy at all:

- Each input is the free 8-d reshape (B, H, T2, wt, H3, wh, W2, ww*D) and
  is passed once per ``wh`` slot-plane with a BlockSpec that pins that
  plane: block (1, 1, 1, wt, H3, 1, W2c, ww*D).  For a fixed (t-row, wh)
  the (W2, ww, D) span is CONTIGUOUS in HBM (one full w-row of the raster,
  ~20 KB runs at 720p), so the strided block DMA streams at near peak.
- Inside the kernel a slot (ti, hi, wi) is ref[ti] (static leading index)
  plus a lane slice [:, wi*D:(wi+1)*D] — both free on Mosaic, which
  rejects sublane-strided slices and >2-D gathers (probed on the v5e).
- Kept margins are written as lane slices of a (Gc, U*D) block, so the
  group-major pooled layout [centers | g-major margins] falls out of a
  free reshape — no output transpose either.

The matching is computed once from Q and shared by K/V (reference:
wan.py:250-255), or separately from K for Hunyuan (hunyuan.py:433-438).
The unpool kernel re-derives Q's matching (identical deterministic
arithmetic) and scatters attention outputs back through per-``wh``-plane
strided output blocks, dropped slots receiving their group center.

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


def _matching_3d(x_all32, gs: int, u: int, cs: int, with_idx: bool = False):
    """Per-group kept-margin picks from a (gs, Gc, D) f32 slot-major stack.

    Returns a (u, gs, Gc, 1) f32 one-hot pick tensor (and, with
    ``with_idx``, the picked slot ids as (u, Gc, 1) i32).  Identical
    arithmetic to ops/coreset.py: cosine RANKING via (c.m)*rsqrt(||m||^2),
    center excluded with a +inf sentinel, u iterative arg-min passes with
    ties to the lower slot index.  All reductions run over the leading slot
    axis or the lane axis — no strided/sublane-split accesses (Mosaic
    constraint).
    """
    c = x_all32[cs]  # (Gc, D)
    dot = jnp.sum(x_all32 * c[None], axis=-1, keepdims=True)  # (gs, Gc, 1)
    sq = jnp.sum(x_all32 * x_all32, axis=-1, keepdims=True)
    sim = dot * jax.lax.rsqrt(jnp.maximum(sq, 1e-24))  # (gs, Gc, 1)
    inf = jnp.float32(jnp.inf)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0)
    sim = jnp.where(slot_iota == cs, inf, sim)
    picks, idxs = [], []
    for _ in range(u):
        m = jnp.min(sim, axis=0, keepdims=True)
        idx = jnp.min(jnp.where(sim <= m, slot_iota, gs), axis=0, keepdims=True)
        pick = slot_iota == idx  # (gs, Gc, 1) bool
        picks.append(pick.astype(jnp.float32))
        idxs.append(idx[0])  # (Gc, 1) i32
        sim = jnp.where(pick, inf, sim)
    stacked = jnp.stack(picks, axis=0)  # (u, gs, Gc, 1)
    if with_idx:
        # lane-concat: (Gc, u) — u rides the LANE axis so downstream
        # reshapes are sublane-only (Mosaic-supported shape casts)
        return stacked, jnp.concatenate(idxs, axis=-1)
    return stacked


def _stack_slots(hi_refs, window, d):
    """[wh refs of block (1,1,1,wt,H3,1,W2c,ww*D)] -> (gs, Gc, D) f32 stack
    in slot-raster order (ti, hi, wi)."""
    wt, wh, ww = window
    tiles = []
    for ti in range(wt):
        for hi in range(wh):
            r = hi_refs[hi][0, 0, 0, ti, :, 0]  # (H3, W2c, ww*D)
            rows = r.reshape(r.shape[0] * r.shape[1], ww * d)
            for wi in range(ww):
                tiles.append(rows[:, wi * d : (wi + 1) * d])
    return jnp.stack(tiles, axis=0).astype(jnp.float32)  # (gs, Gc, D)


def _pool_kernel(*refs, window, d, u, cs, kv_from_k: bool, mode: str,
                 with_picks: bool = False):
    wt, wh, ww = window
    gs = wt * wh * ww
    it = iter(refs)
    active_ref = hm_ref = na_ref = None
    if mode == "active":
        active_ref = next(it)  # (H,) i32 scalar prefetch
    elif mode == "headmap":
        hm_ref = next(it)  # (H,) i32 packed active head ids (pad: repeat last)
        na_ref = next(it)  # (1,) i32 active count
    q_refs = [next(it) for _ in range(wh)]
    k_refs = [next(it) for _ in range(wh)]
    v_refs = [next(it) for _ in range(wh)]
    qc_ref, qm_ref = next(it), next(it)
    kc_ref, km_ref = next(it), next(it)
    vc_ref, vm_ref = next(it), next(it)
    pick_ref = next(it) if with_picks else None

    def body():
        q_all = _stack_slots(q_refs, window, d)  # (gs, Gc, D) f32
        k_all = _stack_slots(k_refs, window, d)
        v_all = _stack_slots(v_refs, window, d)

        if with_picks:
            picks_q, idx_q = _matching_3d(q_all, gs, u, cs, with_idx=True)
            h3, w2c = qc_ref.shape[3], qc_ref.shape[4]
            # (Gc, u) -> (H3, W2c, u): sublane-split only, lane dim (u)
            # unchanged — mirrors the centers' (H3, W2c, D) layout
            pick_ref[0, 0, 0] = idx_q.reshape(h3, w2c, u)
        else:
            picks_q = _matching_3d(q_all, gs, u, cs)
        picks_kv = _matching_3d(k_all, gs, u, cs) if kv_from_k else picks_q

        def emit(x_all, picks, c_ref, m_ref):
            h3, w2c = c_ref.shape[3], c_ref.shape[4]
            c_ref[0, 0, 0] = x_all[cs].reshape(h3, w2c, d).astype(c_ref.dtype)
            kept = jnp.concatenate(
                [jnp.sum(picks[i] * x_all, axis=0) for i in range(u)], axis=-1
            )  # (Gc, U*D) — lane-major kept, group-major after reshape
            m_ref[0, 0, 0] = kept.reshape(h3, w2c, u * d).astype(m_ref.dtype)

        emit(q_all, picks_q, qc_ref, qm_ref)
        emit(k_all, picks_kv, kc_ref, km_ref)
        emit(v_all, picks_kv, vc_ref, vm_ref)

    def zero():
        # zero-fill so downstream masked attention never sees uninit VMEM
        outs = (qc_ref, qm_ref, kc_ref, km_ref, vc_ref, vm_ref)
        if with_picks:
            outs = outs + (pick_ref,)
        for r in outs:
            r[...] = jnp.zeros_like(r)

    if mode == "plain":
        body()
        return
    if mode == "headmap":
        # padded grid positions revisit the last active head's blocks: their
        # input DMAs are elided (unchanged block index) and the untouched
        # output buffer re-flushes the same values — so they must NOT write
        hh = pl.program_id(2)

        @pl.when(hh < na_ref[0])
        def _active_hm():
            body()

        return
    g = pl.program_id(1)

    @pl.when(active_ref[g] > 0)
    def _active():
        body()

    @pl.when(active_ref[g] == 0)
    def _skip():
        zero()


def _unpool_kernel(*refs, window, d, u, cs, mode: str,
                   from_picks: bool = False):
    wt, wh, ww = window
    gs = wt * wh * ww
    it = iter(refs)
    active_ref = hm_ref = na_ref = None
    if mode == "active":
        active_ref = next(it)
    elif mode == "headmap":
        hm_ref = next(it)
        na_ref = next(it)
    if from_picks:
        pick_ref = next(it)  # (1,1,1,H3,W2c,u) i32 slot ids from pool_qkv
        q_refs = None
    else:
        q_refs = [next(it) for _ in range(wh)]
    c_ref, m_ref = next(it), next(it)
    out_refs = [next(it) for _ in range(wh)]

    def body():
        h3, w2c = c_ref.shape[3], c_ref.shape[4]
        if from_picks:
            # re-materialize the one-hot picks from the pool pass's slot
            # ids: no q read, no matching recompute.  (H3,W2c,u) ->
            # (Gc, u) is a leading-dim collapse (lane dim u unchanged).
            idx = pick_ref[0, 0, 0].reshape(h3 * w2c, u)  # (Gc, u) i32

            def pick(i, s):
                return (idx[:, i : i + 1] == s).astype(jnp.float32)  # (Gc, 1)
        else:
            q_all = _stack_slots(q_refs, window, d)
            picks = _matching_3d(q_all, gs, u, cs)  # (u, gs, Gc, 1)

            def pick(i, s):
                return picks[i, s]  # (Gc, 1)

        centers = c_ref[0, 0, 0].reshape(h3 * w2c, d).astype(jnp.float32)
        kept_rows = m_ref[0, 0, 0].reshape(h3 * w2c, u * d).astype(jnp.float32)
        for ti in range(wt):
            for hi in range(wh):
                lanes = []
                for wi in range(ww):
                    s = ti * wh * ww + hi * ww + wi
                    val = jnp.zeros_like(centers)
                    mask = jnp.zeros((centers.shape[0], 1), jnp.float32)
                    for i in range(u):
                        p = pick(i, s)  # (Gc, 1)
                        val = val + p * kept_rows[:, i * d : (i + 1) * d]
                        mask = mask + p
                    lanes.append(val + (1.0 - mask) * centers)
                slab = jnp.concatenate(lanes, axis=-1)  # (Gc, ww*D)
                out_refs[hi][0, 0, 0, ti] = slab.reshape(
                    h3, w2c, ww * d
                ).astype(out_refs[hi].dtype)

    def zero():
        for r in out_refs:
            r[...] = jnp.zeros_like(r)

    if mode == "plain":
        body()
        return
    if mode == "headmap":
        hh = pl.program_id(2)

        @pl.when(hh < na_ref[0])
        def _active_hm():
            body()

        return
    g = pl.program_id(1)

    @pl.when(active_ref[g] > 0)
    def _active():
        body()

    @pl.when(active_ref[g] == 0)
    def _skip():
        zero()


def _shapes(x, groups: LowresGroups):
    geom = _geom(groups)
    t, hh, w = geom.latent_shape
    b, h, s, d = x.shape
    if s != t * hh * w:
        raise ValueError(f"seq len {s} != prod(latent_shape) {geom.latent_shape}")
    return geom, (b, h, d)


def _cell_plan(geom, d: int, u: int, itemsize: int):
    """(T2, H3, W2, W2c): one grid cell covers (wt, H3, 1-of-wh, W2c) with
    the w-group dim split just enough to keep the live VMEM near ~48 MB."""
    t, hh, w = geom.latent_shape
    wt, wh, ww = geom.window
    t2, h3, w2 = t // wt, hh // wh, w // ww
    gs = wt * wh * ww

    def est(w2c):
        gc = h3 * w2c
        inb = 3 * wh * wt * gc * ww * d * max(itemsize, 2) * 2  # dbuf blocks
        stack = 3 * gs * gc * d * 4
        outb = 3 * gc * (1 + u) * d * max(itemsize, 2) * 2
        return inb + stack + outb

    w2c = w2
    for cand in sorted((c for c in range(1, w2 + 1) if w2 % c == 0), reverse=True):
        if est(cand) < 48 * 2**20:
            w2c = cand
            break
    return t2, h3, w2, w2c


def _mode_plan(active, head_map, num_active):
    if head_map is not None:
        if num_active is None:
            raise ValueError("head_map requires num_active")
        if active is not None:
            raise ValueError("head_map and active are mutually exclusive")
        return "headmap"
    return "active" if active is not None else "plain"


def pool_qkv(
    q: jax.Array, k: jax.Array, v: jax.Array, groups: LowresGroups,
    *, kv_matching_from_k: bool = False, active: Optional[jax.Array] = None,
    head_map: Optional[jax.Array] = None,
    num_active: Optional[jax.Array] = None,
    return_picks: bool = False,
    interpret: bool = False,
):
    """Pool (B,H,S,D) q/k/v to (B,H,P,D) in one fused kernel pass.

    Pooled layout matches ops/coreset.py: [all G centers | all G*U kept
    margins], group-major, margins least-similar-first.

    ``active``: optional (H,) participation mask — inactive heads skip all
    matching/selection compute and emit zeros (their rows are expected to
    be masked out of the downstream pooled attention anyway).

    ``head_map``/``num_active``: head-scaled mode — head_map is a traced
    (H,) i32 with the routed head ids packed first and the LAST routed id
    repeated as padding; num_active is the routed count.  The head grid dim
    moves innermost with "arbitrary" semantics, so every padded position
    revisits the last routed head's blocks: Pallas elides the unchanged
    input DMAs and output flushes, making data movement AND compute scale
    with the routed head count.  Output rows of heads NOT in head_map are
    UNINITIALIZED — callers must mask downstream (see
    ops/routed_fused.lowres_all_batched).

    ``return_picks``: also return Q's matching as an opaque slot-id tensor
    (layout (B,H,T2,H3,W2,U) i32) that ``unpool(..., picks=...)`` consumes
    directly — the unpool pass then skips re-reading q and re-deriving the
    matching entirely.
    """
    geom, (b, h, d) = _shapes(q, groups)
    wt, wh, ww = geom.window
    u = groups.num_kept_margins
    g = groups.num_groups
    cs = geom.center_slot
    t2, h3, w2, w2c = _cell_plan(geom, d, u, q.dtype.itemsize)
    ns = w2 // w2c
    mode = _mode_plan(active, head_map, num_active)

    kernel = functools.partial(
        _pool_kernel, window=geom.window, d=d, u=u, cs=cs,
        kv_from_k=kv_matching_from_k, mode=mode, with_picks=return_picks,
    )

    if mode == "headmap":

        def in_map(hi, bb, i, hh_, hm, na):
            return (bb, hm[hh_], i // ns, 0, 0, hi, i % ns, 0)

        def out_map(bb, i, hh_, hm, na):
            return (bb, hm[hh_], i // ns, 0, i % ns, 0)

        pick_map = out_map

        grid = (b, t2 * ns, h)
        semantics = ("parallel", "arbitrary", "arbitrary")
    else:

        def in_map(hi, bb, hh_, i, *refs):
            return (bb, hh_, i // ns, 0, 0, hi, i % ns, 0)

        def out_map(bb, hh_, i, *refs):
            return (bb, hh_, i // ns, 0, i % ns, 0)

        pick_map = out_map

        grid = (b, h, t2 * ns)
        semantics = ("parallel", "parallel", "parallel")

    # free views: raster (B,H,S,D) -> (B,H,T2,wt,H3,wh,W2,ww*D)
    def view(x):
        return x.reshape(b, h, t2, wt, h3, wh, w2, ww * d)

    in_block = (1, 1, 1, wt, h3, 1, w2c, ww * d)
    in_specs, inputs = [], []
    for x in (q, k, v):
        xv = view(x)
        for hi in range(wh):
            in_specs.append(pl.BlockSpec(in_block, functools.partial(in_map, hi)))
            inputs.append(xv)

    out_shapes, out_specs = [], []
    for _ in range(3):
        out_shapes += [
            jax.ShapeDtypeStruct((b, h, t2, h3, w2, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, t2, h3, w2, u * d), q.dtype),
        ]
        out_specs += [
            pl.BlockSpec((1, 1, 1, h3, w2c, d), out_map),
            pl.BlockSpec((1, 1, 1, h3, w2c, u * d), out_map),
        ]
    if return_picks:
        out_shapes.append(
            jax.ShapeDtypeStruct((b, h, t2, h3, w2, u), jnp.int32))
        out_specs.append(pl.BlockSpec((1, 1, 1, h3, w2c, u), pick_map))

    if mode == "headmap":
        prefetch = (
            head_map.astype(jnp.int32),
            jnp.asarray(num_active, jnp.int32).reshape(1),
        )
    elif mode == "active":
        prefetch = (active.astype(jnp.int32),)
    else:
        prefetch = ()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
            vmem_limit_bytes=80 * 2**20,
        ),
        interpret=interpret,
    )(*prefetch, *inputs)

    def finish(c, m):
        # (B,H,T2,H3,W2,·) raster-group blocks -> pooled rows, all free views
        centers = c.reshape(b, h, g, d)
        margins = m.reshape(b, h, g * u, d)  # (g, u, d) order = group-major
        return jnp.concatenate([centers, margins], axis=2)

    qc, qm, kc, km, vc, vm = outs[:6]
    pooled = (finish(qc, qm), finish(kc, km), finish(vc, vm))
    if return_picks:
        return pooled + (outs[6],)
    return pooled


def unpool(
    pooled_out: jax.Array, q: jax.Array, groups: LowresGroups,
    *, active: Optional[jax.Array] = None,
    head_map: Optional[jax.Array] = None,
    num_active: Optional[jax.Array] = None,
    picks: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Scatter a pooled (B,H,P,D) attention output back to (B,H,S,D),
    re-deriving Q's matching in-kernel (bitwise-identical arithmetic) — or,
    when ``picks`` (from ``pool_qkv(return_picks=True)``) is given, reusing
    the pool pass's matching: no q read, no matching recompute.

    ``active``: optional (H,) participation mask — inactive heads skip the
    matching compute and write zeros.

    ``head_map``/``num_active``: head-scaled mode (see pool_qkv) — rows of
    heads not in head_map come back UNINITIALIZED; callers mask them."""
    geom, (b, h, d) = _shapes(q, groups)
    wt, wh, ww = geom.window
    u = groups.num_kept_margins
    g = groups.num_groups
    cs = geom.center_slot
    t2, h3, w2, w2c = _cell_plan(geom, d, u, q.dtype.itemsize)
    ns = w2 // w2c
    mode = _mode_plan(active, head_map, num_active)

    kernel = functools.partial(
        _unpool_kernel, window=geom.window, d=d, u=u, cs=cs, mode=mode,
        from_picks=picks is not None,
    )
    # free views of the group-major pooled rows
    centers = pooled_out[:, :, :g].reshape(b, h, t2, h3, w2, d)
    kept = pooled_out[:, :, g : g * (1 + u)].reshape(b, h, t2, h3, w2, u * d)
    qv = q.reshape(b, h, t2, wt, h3, wh, w2, ww * d)

    if mode == "headmap":

        def in_map(hi, bb, i, hh_, hm, na):
            return (bb, hm[hh_], i // ns, 0, 0, hi, i % ns, 0)

        def c_map(bb, i, hh_, hm, na):
            return (bb, hm[hh_], i // ns, 0, i % ns, 0)

        def o_map(bb, i, hh_, hm, na):
            return (bb, hm[hh_], i // ns, 0, 0, i % ns, 0)

        pick_map = c_map

        grid = (b, t2 * ns, h)
        semantics = ("parallel", "arbitrary", "arbitrary")
    else:

        def in_map(hi, bb, hh_, i, *refs):
            return (bb, hh_, i // ns, 0, 0, hi, i % ns, 0)

        def c_map(bb, hh_, i, *refs):
            return (bb, hh_, i // ns, 0, i % ns, 0)

        def o_map(bb, hh_, i, *refs):
            return (bb, hh_, i // ns, 0, 0, i % ns, 0)

        pick_map = c_map

        grid = (b, h, t2 * ns)
        semantics = ("parallel", "parallel", "parallel")

    in_block = (1, 1, 1, wt, h3, 1, w2c, ww * d)
    if picks is not None:
        in_specs = [pl.BlockSpec((1, 1, 1, h3, w2c, u), pick_map)]
    else:
        in_specs = [
            pl.BlockSpec(in_block, functools.partial(in_map, hi))
            for hi in range(wh)
        ]
    in_specs += [
        pl.BlockSpec((1, 1, 1, h3, w2c, d), c_map),
        pl.BlockSpec((1, 1, 1, h3, w2c, u * d), c_map),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((b, h, t2, wt, h3, w2, ww * d), pooled_out.dtype)
        for _ in range(wh)
    ]
    out_specs = [
        pl.BlockSpec((1, 1, 1, wt, h3, w2c, ww * d), o_map) for _ in range(wh)
    ]
    if mode == "headmap":
        prefetch = (
            head_map.astype(jnp.int32),
            jnp.asarray(num_active, jnp.int32).reshape(1),
        )
    elif mode == "active":
        prefetch = (active.astype(jnp.int32),)
    else:
        prefetch = ()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
    )

    data_in = ((picks,) if picks is not None else tuple([qv] * wh))
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
            vmem_limit_bytes=80 * 2**20,
        ),
        interpret=interpret,
    )(*prefetch, *data_in, centers, kept)
    # (B,H,T2,wt,H3,W2,ww*D) per wh plane -> raster (B,H,S,D)
    full = jnp.stack(outs, axis=5)  # (B,H,T2,wt,H3,wh,W2,ww*D)
    return full.reshape(b, h, t2 * wt * h3 * wh * w2 * ww, d)
