"""Full-depth Wan-14B routed-vs-full denoise benchmark on ONE v5e.

Wan2.1-14B bf16 (28 GB) exceeds the chip's 16 GB HBM; the reference runs it
with model CPU offload (scripts/wan/inference.py:156-162).  Here the stacked
frozen block weights live in HBM at int4 (ops/quant, ~7 GB incl. scales) and
every scan step dequantizes one block to bf16 before running it — all 40
blocks, the real 720p geometry, no depth extrapolation.

The routers are random-init with their final-layer bias set so the hard
routing reproduces the 1.3B trained-router head mix (0% full / 39% lowres /
61% STA, assets/bench_router_wan1_3b.npz protocol) — documented as
"trained-mix emulation" since no 14B router checkpoint exists in this
environment.

Usage: python tools/bench_wan14b.py [--bits 4] [--iters 2] [--routing both]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=4, choices=[4, 8])
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--routing", default="both", choices=["both", "off", "hard"])
    ap.add_argument("--mm", default="bf16", choices=["bf16", "int8", "int8_static"],
                    help="int8: W8A8 serving mode for block FFN/projections; "
                         "int8_static self-calibrates static activation "
                         "scales first (ops/qmm.py)")
    ap.add_argument("--frames", type=int, default=77)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--cache", default="/tmp/wan14b_q.pkl",
                    help="pickle cache of the quantized stack (host prep ~20 min)")
    ap.add_argument("--cache_threshold", type=float, default=0.0,
                    help="composed arm: run a REAL host-driven denoise "
                         "trajectory (one dispatch per step, so the ~60 s "
                         "tunnel kill never triggers) with step-residual "
                         "caching on top of routing (+ --mm int8_static); "
                         "reports measured per-step ms and skip count")
    ap.add_argument("--cache_poly", default=None,
                    help="fitted TeaCache rescale npz (tools/fit_cache_poly)")
    ap.add_argument("--steps", type=int, default=20,
                    help="trajectory length for the --cache_threshold arm")
    ap.add_argument("--flow_shift", type=float, default=5.0)
    ap.add_argument("--qk_int8", action="store_true",
                    help="serving mode: int8 QK^T on the full/lowres experts "
                         "(routed + composed arms only; the full-attention "
                         "denominator stays bf16)")
    args = ap.parse_args()

    import dataclasses
    import json

    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from flax import nnx

    from vorta_tpu.config import WAN_14B, AttentionConfig
    from vorta_tpu.models.wan import WanModel
    from vorta_tpu.ops.quant import QTensor, quantize_stacked_tree, quantized_bytes

    cfg = WAN_14B
    t_lat = (args.frames - 1) // 4 + 1
    grid = (t_lat, args.height // 16, args.width // 16)
    attn = AttentionConfig(
        latent_shape=grid, sta_window=(3, 3, 3), sta_tile=(5, 9, 8),
        # 1000-token blocks divide S=72000 and pooled 36000 exactly: the
        # padded q/k/v copies of 1024-blocks (+7.1 GB at 40 heads) would
        # not fit HBM next to the quantized stack
        lowres_window=(2, 3, 2), block_q=1000, block_kv=1000, tau_sparse=0.3,
    )
    attn_r = dataclasses.replace(attn, qk_int8=True) if args.qk_int8 else attn

    # depth-1 host model supplies the non-block modules + the block graphdef;
    # the real 40-block stack arrives via quantized_blocks
    cfg1 = dataclasses.replace(cfg, num_layers=1)
    model = WanModel(cfg1, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                     rngs=nnx.Rngs(0))

    # abstract full-depth block stack -> host random init -> int4 quantize
    abs_model = nnx.eval_shape(
        lambda: WanModel(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                         rngs=nnx.Rngs(0))
    )
    _, abs_blocks = nnx.split(abs_model.blocks)

    rng = np.random.default_rng(0)
    n_heads, n_exp = cfg.num_heads, 3
    n_lowres = round(0.39 * n_heads)

    def init_leaf(path, leaf):
        shape, dtype = leaf.shape, leaf.dtype
        name = "/".join(str(p) for p in path)
        # uniform f32 init: ~10x faster than standard_normal at 14e9 elements
        arr = (rng.random(shape, dtype=np.float32) - 0.5) * 0.05
        if "router" in name and "bias" in name:
            # trained-mix emulation: head h -> lowres (h < 39%*H) else STA
            bias = np.zeros(shape[-1], np.float32)
            for h in range(n_heads):
                e = 1 if h < n_lowres else 2
                bias[h * n_exp + e] = 8.0
            arr = np.broadcast_to(bias, shape).copy()
        # stay f32 on host: quantize records bf16 as the dequant dtype
        return arr.astype(np.dtype(dtype)) if dtype != jnp.bfloat16 else arr

    import pickle
    from pathlib import Path

    cache = Path(args.cache + f".b{args.bits}")
    if cache.exists():
        t0 = time.time()
        qtree = pickle.loads(cache.read_bytes())
        print(f"[14b] quantized stack from cache {time.time() - t0:.0f}s", flush=True)
    else:
        # init + quantize ONE layer, then tile it across the depth: ~40x
        # faster host prep and timing-identical — the router bias emulation
        # already forces every block to the same head mix, so repeated
        # weights change no dispatch decision, only the (value-independent)
        # arithmetic.  This replaced a 56 GB f32 full-random init that took
        # ~55 min of host time.
        t0 = time.time()
        abs1 = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct((1,) + a.shape[1:], a.dtype),
            abs_blocks)
        host1 = jax.tree_util.tree_map_with_path(init_leaf, abs1)
        q1 = quantize_stacked_tree(host1, bits=args.bits, out_dtype=ml_dtypes.bfloat16)
        del host1
        L = cfg.num_layers

        def tile(leaf):
            if isinstance(leaf, QTensor):
                return QTensor(
                    q=np.repeat(np.asarray(leaf.q), L, axis=0),
                    scale=np.repeat(np.asarray(leaf.scale), L, axis=0),
                    shape=(L,) + tuple(leaf.shape[1:]),
                    dtype=leaf.dtype, bits=leaf.bits)
            return np.repeat(np.asarray(leaf), L, axis=0)

        qtree = jax.tree.map(tile, q1, is_leaf=lambda x: isinstance(x, QTensor))
        print(f"[14b] one-layer init+quantize+tile {time.time() - t0:.0f}s -> "
              f"{quantized_bytes(qtree) / 2**30:.2f} GiB", flush=True)
        cache.write_bytes(pickle.dumps(qtree, protocol=4))
    qtree = jax.tree.map(jnp.asarray, qtree)
    jax.block_until_ready(jax.tree.leaves(qtree))
    print("[14b] quantized stack on device", flush=True)

    b = 1
    latents = jax.random.normal(
        jax.random.PRNGKey(0),
        (b, t_lat, args.height // 8, args.width // 8, cfg.in_channels),
        jnp.bfloat16)
    context = jax.random.normal(
        jax.random.PRNGKey(1), (b, cfg.text_len, cfg.text_dim), jnp.bfloat16)

    graphdef, state = nnx.split(model)

    mm = args.mm
    act_scales = None
    if args.mm == "int8_static":
        mm = "int8"

        @jax.jit
        def calib_fwd(state, qtree, lat, ctx, t):
            m = nnx.merge(graphdef, state)
            return m(lat, t, ctx, attn_cfg=attn, routing_mode="hard",
                     quantized_blocks=qtree, calibrate_mm=True).mm_calibration

        t0 = time.time()
        amax = None
        for ts in (200.0, 500.0, 800.0):
            a = jax.tree.map(
                np.asarray,
                calib_fwd(state, qtree, latents, context, jnp.full((b,), ts)),
            )
            amax = a if amax is None else {k: np.maximum(amax[k], a[k]) for k in amax}
        act_scales = {k: v / 127.0 for k, v in amax.items()}
        print(f"[14b] int8 calibration {time.time() - t0:.0f}s "
              f"({len(act_scales)} sites)", flush=True)

    results = {}
    for mode in ("off", "hard"):
        if args.routing not in ("both", mode):
            continue

        @jax.jit
        def run(state, qtree, latents, context):
            def body(c, i):
                m = nnx.merge(graphdef, state)
                lat = latents * (1 + 0.001 * i.astype(jnp.bfloat16))
                out = m(lat, jnp.full((b,), 500.0), context,
                        attn_cfg=attn if mode == "off" else attn_r,
                        routing_mode=mode, quantized_blocks=qtree,
                        mm_precision=mm, act_scales=act_scales)
                return c + out.sample.astype(jnp.float32).mean(), ()

            cf, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                 jnp.arange(args.iters))
            return cf

        t0 = time.time()
        float(run(state, qtree, latents, context))
        print(f"[14b] {mode}: compile+first {time.time() - t0:.0f}s", flush=True)
        t0 = time.time()
        float(run(state, qtree, latents, context))
        dt = (time.time() - t0) / args.iters
        results[mode] = dt
        print(f"[14b] {mode}: {dt * 1e3:.0f} ms/fwd", flush=True)

    if len(results) == 2:
        print(json.dumps({
            "model": "wan-14B", "geometry": f"{args.frames}f@{args.height}p",
            "bits": args.bits,
            "full_ms": round(results["off"] * 1e3, 1),
            "routed_ms": round(results["hard"] * 1e3, 1),
            "speedup": round(results["off"] / results["hard"], 3),
        }), flush=True)

    if args.cache_threshold > 0.0:
        # --- composed arm: routing (+ optional int8_static) + step cache on
        # a real denoise trajectory.  Host-driven: ONE jitted step per
        # dispatch (same compiled program for compute and skip steps via the
        # traced lax.cond), so nothing hits the 60 s tunnel dispatch kill.
        # The per-step wall times (device-synced) sum to the composed cost.
        from vorta_tpu.ops.stepcache import init_step_cache
        from vorta_tpu.schedulers.flow_match import FlowMatchEulerSchedule

        schedule = FlowMatchEulerSchedule.create(args.steps, shift=args.flow_shift)
        sigmas = np.asarray(schedule.sigmas)
        timesteps = np.asarray(schedule.timesteps)
        coeffs = (tuple(float(c) for c in np.load(args.cache_poly)["coefficients"])
                  if args.cache_poly else None)
        seq = grid[0] * grid[1] * grid[2]
        ind_dim = 6 * cfg.dim

        @jax.jit
        def step_fn(state, qtree, lat, t, cache, force):
            m = nnx.merge(graphdef, state)
            out = m(lat.astype(jnp.bfloat16), t, context, attn_cfg=attn_r,
                    routing_mode="hard", quantized_blocks=qtree,
                    mm_precision=mm, act_scales=act_scales,
                    step_cache=cache, cache_threshold=args.cache_threshold,
                    cache_force_compute=force, cache_coefficients=coeffs)
            return out.sample.astype(jnp.float32), out.step_cache

        def fresh_cache():
            return init_step_cache(b, seq, cfg.dim, ind_dim, jnp.bfloat16)

        lat = latents.astype(jnp.float32)
        t0 = time.time()
        v, c0 = step_fn(state, qtree, lat, jnp.full((b,), timesteps[0]),
                        fresh_cache(), jnp.asarray(True))
        jax.block_until_ready((v, c0))
        print(f"[14b] cache arm: compile+first {time.time() - t0:.0f}s", flush=True)

        cache_c = fresh_cache()
        times, skips = [], 0
        for i in range(args.steps):
            force = (i < 1) or (i == args.steps - 1)
            t0 = time.time()
            v, cache_c = step_fn(state, qtree, lat,
                                 jnp.full((b,), timesteps[i]), cache_c,
                                 jnp.asarray(force))
            jax.block_until_ready((v, cache_c))
            dt = time.time() - t0
            # a computed step resets acc to 0; a skipped step carries acc > 0
            skipped = bool(float(cache_c.acc) > 0.0)
            skips += skipped
            times.append(dt)
            lat = lat + float(sigmas[i + 1] - sigmas[i]) * v
            print(f"[14b] step {i}: {dt * 1e3:.0f} ms "
                  f"{'SKIP' if skipped else 'compute'}", flush=True)
        mean_ms = float(np.mean(times) * 1e3)
        out = {
            "model": "wan-14B", "arm": "routed+cache",
            "geometry": f"{args.frames}f@{args.height}p",
            "bits": args.bits, "mm": args.mm,
            "qk": "int8" if args.qk_int8 else "bf16",
            "cache_threshold": args.cache_threshold,
            "cache_poly": bool(coeffs),
            "steps": args.steps, "skips": skips,
            "composed_ms_per_step": round(mean_ms, 1),
        }
        if "off" in results:
            out["full_ms"] = round(results["off"] * 1e3, 1)
            out["composed_speedup"] = round(results["off"] * 1e3 / mean_ms, 3)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
