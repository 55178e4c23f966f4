"""Bottleneck bisection for the window-dense STA kernel (Wan 720p geometry).

Variants:
  full       the real kernel loop (dots + online softmax + DMA)
  dots_only  both MXU dots per chunk, softmax replaced by a scalar scale
  dma_only   DMA waits only, no compute
  no_dma     compute on whatever is resident (skips waits after warmup)

Comparing these isolates MXU vs VPU-softmax vs DMA vs per-cell overhead.
Usage: python tools/sta_diag.py [variants...]

Round-2 findings on v5e at Wan 720p (12 heads, 200 tiles):
  full 46.5 / full_unroll 52.4 / dots_only 42.4 / dma_only 27.0 ms.
  => the kernel is DMA-bound and ADDITIVE: total ~= DMA (27) + MXU dots
  (15.4) + softmax (4).  The window box DMAs (6KB contiguous runs) reach
  only ~445 GB/s, and overlapping them with compute does not happen in
  practice: static slot indices (full_unroll) do not help, t-supertiling
  (halves DMA bytes, needs vmem_limit_bytes raised past the 16MB scoped
  default — the hardware accepts 64MB) measured flat at 49.4, and extra
  softmax chains are flat.  Next levers (round 3): restructure so KV
  stream via the grid pipeline (BlockSpec-managed transfers DO overlap),
  or make runs longer by fetching whole (th, W) slabs shared across the
  w-row of q tiles.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vorta_tpu.ops.sta_window import window_starts

NEG_INF = float(-1e30)
LOG2E = 1.4426950408889634


def _kernel(starts_ref, q_ref, k_hbm, v_hbm, out_ref, m_s, l_s, acc_s,
            k_buf, v_buf, dma_sems, *, tile, win_eff, variant, scale):
    i = pl.program_id(2)
    b = pl.program_id(0)
    g = pl.program_id(1)
    tt, th, tw = tile
    tpt = tt * th * tw
    d = q_ref.shape[-1]
    bw = win_eff[2] * tw
    n_chunks = win_eff[0] * win_eff[1]
    n_slots = k_buf.shape[0]
    t0 = starts_ref[i, 0]
    h0 = starts_ref[i, 1]
    w0 = pl.multiple_of(starts_ref[i, 2], 8)

    def chunk_dma(slot, j):
        dt = j // win_eff[1]
        dh = j - dt * win_eff[1]
        kc = pltpu.make_async_copy(
            k_hbm.at[b, g, pl.ds(t0 + dt * tt, tt), pl.ds(h0 + dh * th, th),
                     pl.ds(w0, bw), :],
            k_buf.at[slot], dma_sems.at[slot, 0])
        vc = pltpu.make_async_copy(
            v_hbm.at[b, g, pl.ds(t0 + dt * tt, tt), pl.ds(h0 + dh * th, th),
                     pl.ds(w0, bw), :],
            v_buf.at[slot], dma_sems.at[slot, 1])
        return kc, vc

    m_s[...] = jnp.full_like(m_s, NEG_INF)
    l_s[...] = jnp.zeros_like(l_s)
    acc_s[...] = jnp.zeros_like(acc_s)
    for j in range(min(n_slots, n_chunks)):
        kc, vc = chunk_dma(j, j)
        kc.start()
        vc.start()
    q = q_ref[0, 0].reshape(tpt, d)

    def qk(j):
        slot = jax.lax.rem(j, n_slots)
        kc, vc = chunk_dma(slot, j)
        if variant != "no_dma":
            kc.wait()
            vc.wait()
        if variant == "dma_only":
            return None, slot
        k = k_buf[slot].reshape(tt * th * bw, d)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return s * (scale * LOG2E), slot

    def soft_pv(chain, s, slot):
        if variant == "dma_only":
            return
        v = v_buf[slot].reshape(tt * th * bw, d)
        if variant == "dots_only":
            p = (s * 0.001).astype(v.dtype)
            acc_s[chain] += jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return
        m_prev = m_s[chain]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        l_s[chain] = l_s[chain] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_s[chain] = m_new
        p = p.astype(v.dtype)
        acc_s[chain] = acc_s[chain] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    def pair_body(jp, _):
        j = 2 * jp
        s_a, sl_a = qk(j)
        s_b, sl_b = qk(j + 1)
        soft_pv(0, s_a, sl_a)
        soft_pv(1, s_b, sl_b)
        for c in range(2):
            jj = j + c

            @pl.when(jj + n_slots < n_chunks)
            def _pref():
                kc, vc = chunk_dma(jax.lax.rem(jj + n_slots, n_slots), jj + n_slots)
                kc.start()
                vc.start()

        return 0

    if variant == "full_unroll":
        # fully static chunk indices: every slot index is a Python int, so
        # Mosaic can disambiguate buffer accesses and overlap DMA/compute
        def qk_s(j):
            slot = j % n_slots
            kc, vc = chunk_dma(slot, j)
            kc.wait()
            vc.wait()
            k = k_buf[slot].reshape(tt * th * bw, d)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return s * (scale * LOG2E), slot

        for j in range(n_chunks):
            s_j, sl_j = qk_s(j)
            soft_pv(j % 2, s_j, sl_j)
            if j + n_slots < n_chunks:
                kc, vc = chunk_dma((j + n_slots) % n_slots, j + n_slots)
                kc.start()
                vc.start()
    else:
        jax.lax.fori_loop(0, n_chunks // 2, pair_body, 0)
        if n_chunks % 2:
            s_a, sl_a = qk(n_chunks - 1)
            soft_pv(0, s_a, sl_a)

    l = l_s[0] + l_s[1]
    acc = acc_s[0] + acc_s[1]
    out_ref[0, 0] = (acc / jnp.where(l == 0.0, 1.0, l)).reshape(
        out_ref.shape[2:]).astype(out_ref.dtype)


def run(variant, latent=(20, 45, 80), tile=(5, 9, 8), window=(3, 3, 3),
        h=12, d=128, iters=4):
    t, hh, w = latent
    tt, th, tw = tile
    nt, nh, nw = t // tt, hh // th, w // tw
    win_eff = (min(window[0], nt), min(window[1], nh), min(window[2], nw))
    bw = win_eff[2] * tw
    tpt = tt * th * tw
    n_tiles = nt * nh * nw
    s = t * hh * w
    starts = jnp.asarray(window_starts(latent, tile, window))
    q = jax.random.normal(jax.random.PRNGKey(0), (1, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (1, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, h, s, d), jnp.bfloat16)
    kernel = functools.partial(_kernel, tile=tile, win_eff=win_eff,
                               variant=variant, scale=d**-0.5)

    def q_map(bb, gg, ii, *r):
        ti = ii // (nh * nw)
        rem = ii - ti * (nh * nw)
        return (bb, gg, ti, rem // nw, rem - (rem // nw) * nw, 0)

    n_slots = 4

    def call(q, k, v):
        q6 = q.reshape(1, h, t, hh, w, d)
        out6 = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1, h, n_tiles),
                in_specs=[
                    pl.BlockSpec((1, 1, tt, th, tw, d), q_map),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((1, 1, tt, th, tw, d), q_map),
                scratch_shapes=[
                    pltpu.VMEM((2, tpt, 1), jnp.float32),
                    pltpu.VMEM((2, tpt, 1), jnp.float32),
                    pltpu.VMEM((2, tpt, d), jnp.float32),
                    pltpu.VMEM((n_slots, tt, th, bw, d), k.dtype),
                    pltpu.VMEM((n_slots, tt, th, bw, d), v.dtype),
                    pltpu.SemaphoreType.DMA((n_slots, 2)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct(q6.shape, q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel")),
        )(starts, q6, k.reshape(1, h, t, hh, w, d), v.reshape(1, h, t, hh, w, d))
        return out6.reshape(1, h, s, d)

    @jax.jit
    def timed(q, k, v):
        def body(c, i):
            out = call(q * (1 + 0.001 * i.astype(jnp.bfloat16)), k, v)
            return c + out.astype(jnp.float32).mean(), ()
        cf, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(iters))
        return cf

    float(timed(q, k, v))
    t0 = time.perf_counter()
    float(timed(q, k, v))
    return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    for variant in (sys.argv[1:] or ["full", "full_unroll", "dots_only", "dma_only"]):
        try:
            sec = run(variant)
            print(f"{variant:10s} {sec * 1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{variant:10s} FAIL {str(e)[:100]}", flush=True)
