"""Full-depth HunyuanVideo-13B routed-vs-full denoise benchmark on ONE v5e.

Same int4 quantized-block-streaming mechanism as tools/bench_wan14b.py
(ops/quant + quantized_blocks=), applied to both MMDiT stacks (20 dual +
40 single blocks) at the reference benchmark geometry 117f x 720x1280
(joint sequence 108,000 video + 256 text tokens).  Replaces the round-2
depth-reduced extrapolation (tools/bench_hunyuan.py) with a true
full-depth measurement.  Routers random-init with biases set to the
trained-mix emulation (39% lowres / 61% STA per head).
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
                    help="int8: W8A8 serving mode for block FFN/projections")
    ap.add_argument("--frames", type=int, default=117)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--cache", default="/tmp/hy13b_q.pkl",
                    help="pickle cache of the quantized stack (host prep ~20 min)")
    ap.add_argument("--depth_frac", type=float, default=1.0,
                    help="run only the first frac of each block stack: the "
                         "full-depth dense fwd (~75 s) exceeds the remote "
                         "tunnel's ~60 s dispatch kill, so the 'off' baseline "
                         "is measured at 0.5 and doubled (labeled in output)")
    ap.add_argument("--fit_full", action="store_true",
                    help="measure the DENSE forward at depth fractions 0.5 "
                         "and 0.75 (both fit inside the 60 s dispatch limit) "
                         "and linear-fit to depth 1.0: a measured-slope "
                         "denominator replacing the doubled 0.5 estimate")
    ap.add_argument("--cache_threshold", default="0.0",
                    help="composed arm: real host-driven denoise trajectory "
                         "(one dispatch per step) with step-residual caching "
                         "on top of routing (+ --mm int8_static); comma list "
                         "sweeps several thresholds in one compile (the "
                         "threshold is a traced scalar)")
    ap.add_argument("--cache_poly", default=None)
    ap.add_argument("--full_ms", type=float, default=None,
                    help="dense full-depth denominator in ms for the "
                         "composed-arm speedup when --routing hard skips "
                         "the off arm (use --fit_full's full_ms_fit)")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--flow_shift", type=float, default=7.0)
    ap.add_argument("--qk_int8", action="store_true",
                    help="serving mode: int8 QK^T on the joint full/lowres "
                         "experts (routed + composed arms; the dense "
                         "denominator stays bf16)")
    ap.add_argument("--calib_frames", type=int, default=45,
                    help="frame count for the int8_static calibration "
                         "forwards (the full 117f calibration pass OOMs "
                         "one v5e; scales are per-site/layer and "
                         "sequence-length independent)")
    args = ap.parse_args()

    import dataclasses
    import json

    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from flax import nnx

    from vorta_tpu.config import AttentionConfig
    from vorta_tpu.models.hunyuan import HUNYUAN_13B, HunyuanModel
    from vorta_tpu.ops.quant import (QTensor, quantize_stacked_tree,
                                     quantized_bytes)

    cfg = HUNYUAN_13B
    t_lat = (args.frames - 1) // 4 + 1
    grid = (t_lat, args.height // 16, args.width // 16)
    attn = AttentionConfig(
        latent_shape=grid, sta_window=(3, 3, 3), sta_tile=(6, 9, 8),
        lowres_window=(2, 3, 2), block_q=1024, block_kv=1024, tau_sparse=0.3,
    )
    attn_r = dataclasses.replace(attn, qk_int8=True) if args.qk_int8 else attn

    cfg1 = dataclasses.replace(cfg, dual_layers=1, single_layers=1)
    model = HunyuanModel(cfg1, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                         rngs=nnx.Rngs(0))

    abs_model = nnx.eval_shape(
        lambda: HunyuanModel(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                             rngs=nnx.Rngs(0))
    )

    rng = np.random.default_rng(0)
    n_heads, n_exp = cfg.num_heads, 3
    n_lowres = round(0.39 * n_heads)

    def init_leaf(path, leaf):
        shape, dtype = leaf.shape, leaf.dtype
        name = "/".join(str(p) for p in path)
        arr = (rng.random(shape, dtype=np.float32) - 0.5) * 0.05
        if "router" in name and "bias" in name:
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
    t0 = time.time()
    if cache.exists():
        host_trees = pickle.loads(cache.read_bytes())
        print(f"[13b] quantized stacks from cache {time.time() - t0:.0f}s", flush=True)
    else:
        # one layer per stack, quantized then tiled across the depth —
        # timing-identical (router-bias emulation fixes the head mix) and
        # ~30x faster host prep than the full-random init
        host_trees = []
        for mod, L in ((abs_model.dual_blocks, cfg.dual_layers),
                       (abs_model.single_blocks, cfg.single_layers)):
            _, abs_blocks = nnx.split(mod)
            abs1 = jax.tree.map(
                lambda a: jax.ShapeDtypeStruct((1,) + a.shape[1:], a.dtype),
                abs_blocks)
            host1 = jax.tree_util.tree_map_with_path(init_leaf, abs1)
            q1 = quantize_stacked_tree(host1, bits=args.bits,
                                       out_dtype=ml_dtypes.bfloat16)
            del host1

            def tile(leaf, L=L):
                if isinstance(leaf, QTensor):
                    return QTensor(
                        q=np.repeat(np.asarray(leaf.q), L, axis=0),
                        scale=np.repeat(np.asarray(leaf.scale), L, axis=0),
                        shape=(L,) + tuple(leaf.shape[1:]),
                        dtype=leaf.dtype, bits=leaf.bits)
                return np.repeat(np.asarray(leaf), L, axis=0)

            host_trees.append(jax.tree.map(
                tile, q1, is_leaf=lambda x: isinstance(x, QTensor)))
        print(f"[13b] init+quantize+tile {time.time() - t0:.0f}s -> "
              f"{sum(quantized_bytes(q) for q in host_trees) / 2**30:.2f} GiB",
              flush=True)
        cache.write_bytes(pickle.dumps(host_trees, protocol=4))
    def slice_tree(qt, frac):
        def visit(leaf):
            if isinstance(leaf, QTensor):
                l2 = max(1, int(round(leaf.shape[0] * frac)))
                return QTensor(q=leaf.q[:l2], scale=leaf.scale[:l2],
                               shape=(l2,) + tuple(leaf.shape[1:]),
                               dtype=leaf.dtype, bits=leaf.bits)
            arr = np.asarray(leaf)
            return arr[: max(1, int(round(arr.shape[0] * frac)))]
        return jax.tree.map(visit, qt,
                            is_leaf=lambda x: isinstance(x, QTensor))

    if args.fit_full:
        # --- measured-slope dense denominator: ms(frac) is linear in frac
        # (the sliced stacks run the same per-block program, frac just sets
        # the scan lengths), so two in-limit points (0.5: ~31 s, 0.75: ~47 s,
        # both < the ~60 s tunnel dispatch kill) pin the full-depth cost.
        b = 1
        latents = jax.random.normal(
            jax.random.PRNGKey(0),
            (b, t_lat, args.height // 8, args.width // 8, cfg.in_channels),
            jnp.bfloat16)
        text = jax.random.normal(
            jax.random.PRNGKey(1), (b, cfg.text_len, cfg.text_dim), jnp.bfloat16)
        mask = jnp.ones((b, cfg.text_len), bool)
        pooled = jax.random.normal(
            jax.random.PRNGKey(2), (b, cfg.pooled_dim), jnp.bfloat16)
        guidance = jnp.full((b,), 6000.0)
        graphdef, state = nnx.split(model)
        fracs = (0.5, 0.75)
        meas = {}
        for frac in fracs:
            sliced = [slice_tree(qt, frac) for qt in host_trees]
            qpair_f = tuple(jax.tree.map(jnp.asarray, qt) for qt in sliced)
            jax.block_until_ready(jax.tree.leaves(qpair_f))

            @jax.jit
            def dense_fwd(state, qpair_f, lat, eps):
                m = nnx.merge(graphdef, state)
                # eps-perturbed input: the tunnel value-caches byte-identical
                # dispatches, so the timed call must differ from the warmup
                return m(lat * (1 + eps), jnp.full((b,), 500.0), text, mask,
                         pooled, guidance=guidance, attn_cfg=attn,
                         routing_mode="off",
                         quantized_blocks=qpair_f).sample.astype(
                             jnp.float32).mean()

            t0 = time.time()
            float(dense_fwd(state, qpair_f, latents, jnp.bfloat16(0.0)))
            print(f"[13b] fit frac={frac}: compile+first {time.time() - t0:.0f}s",
                  flush=True)
            t0 = time.time()
            float(dense_fwd(state, qpair_f, latents, jnp.bfloat16(1e-3)))
            meas[frac] = time.time() - t0
            print(f"[13b] fit frac={frac}: {meas[frac] * 1e3:.0f} ms/fwd",
                  flush=True)
            del qpair_f  # free HBM before the next fraction
        f1, f2 = fracs
        slope = (meas[f2] - meas[f1]) / (f2 - f1)
        full_fit = meas[f2] + slope * (1.0 - f2)
        print(json.dumps({
            "model": "hunyuan-13B", "arm": "dense-denominator-fit",
            "geometry": f"{args.frames}f@{args.height}p", "bits": args.bits,
            "ms_at": {str(f): round(meas[f] * 1e3, 1) for f in fracs},
            "per_depth_slope_ms": round(slope * 1e3, 1),
            "full_ms_fit": round(full_fit * 1e3, 1),
        }), flush=True)
        return

    if args.depth_frac < 1.0:
        host_trees = [slice_tree(qt, args.depth_frac) for qt in host_trees]
        print(f"[13b] depth_frac {args.depth_frac}: stacks sliced", flush=True)
    qtrees = [jax.tree.map(jnp.asarray, qt) for qt in host_trees]
    jax.block_until_ready(jax.tree.leaves(qtrees))

    b = 1
    latents = jax.random.normal(
        jax.random.PRNGKey(0),
        (b, t_lat, args.height // 8, args.width // 8, cfg.in_channels),
        jnp.bfloat16)
    text = jax.random.normal(
        jax.random.PRNGKey(1), (b, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    mask = jnp.ones((b, cfg.text_len), bool)
    pooled = jax.random.normal(
        jax.random.PRNGKey(2), (b, cfg.pooled_dim), jnp.bfloat16)
    guidance = jnp.full((b,), 6000.0)

    graphdef, state = nnx.split(model)
    qpair = tuple(qtrees)

    mm = args.mm
    act_scales = None
    if args.mm == "int8_static":
        mm = "int8"

        # Calibrate at a REDUCED frame count: the calibration forward
        # (hard routing + calibrate_mm amax collection) at the full 108k
        # joint tokens exceeds one v5e's HBM.  act_scales are per-(site,
        # layer) amax over hidden activations — their magnitudes are set by
        # the weights/norms, not the sequence length, so a shorter clip is
        # a valid calibration set (document as with any PTQ calibration).
        c_t = (args.calib_frames - 1) // 4 + 1
        c_grid = (c_t, args.height // 16, args.width // 16)
        c_attn = dataclasses.replace(attn, latent_shape=c_grid,
                                     sta_tile=(min(c_grid[0], 6), 9, 8))
        c_lat = jax.random.normal(
            jax.random.PRNGKey(3),
            (b, c_t, args.height // 8, args.width // 8, cfg.in_channels),
            jnp.bfloat16)

        @jax.jit
        def calib_fwd(state, qpair, lat, text, mask, pooled, t):
            m = nnx.merge(graphdef, state)
            return m(lat, t, text, mask, pooled, guidance=guidance,
                     attn_cfg=c_attn, routing_mode="hard",
                     quantized_blocks=qpair, calibrate_mm=True).mm_calibration

        t0 = time.time()
        amax = None
        for ts in (200.0, 500.0, 800.0):
            a = jax.tree.map(
                np.asarray,
                calib_fwd(state, qpair, c_lat, text, mask, pooled,
                          jnp.full((b,), ts)),
            )
            amax = a if amax is None else {k: np.maximum(amax[k], a[k]) for k in amax}
        act_scales = {k: v / 127.0 for k, v in amax.items()}
        print(f"[13b] int8 calibration @{args.calib_frames}f "
              f"{time.time() - t0:.0f}s ({len(act_scales)} sites)", flush=True)

    results = {}
    for mode in ("off", "hard"):
        if args.routing not in ("both", mode):
            continue

        @jax.jit
        def run(state, qpair, latents, text, mask, pooled):
            def body(c, i):
                m = nnx.merge(graphdef, state)
                lat = latents * (1 + 0.001 * i.astype(jnp.bfloat16))
                out = m(lat, jnp.full((b,), 500.0), text, mask, pooled,
                        guidance=guidance,
                        attn_cfg=attn if mode == "off" else attn_r,
                        routing_mode=mode, quantized_blocks=qpair,
                        mm_precision=mm, act_scales=act_scales)
                return c + out.sample.astype(jnp.float32).mean(), ()

            cf, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                 jnp.arange(args.iters))
            return cf

        t0 = time.time()
        float(run(state, qpair, latents, text, mask, pooled))
        print(f"[13b] {mode}: compile+first {time.time() - t0:.0f}s", flush=True)
        t0 = time.time()
        float(run(state, qpair, latents, text, mask, pooled))
        dt = (time.time() - t0) / args.iters
        results[mode] = dt
        print(f"[13b] {mode}: {dt * 1e3:.0f} ms/fwd", flush=True)

    if len(results) == 2:
        print(json.dumps({
            "model": "hunyuan-13B", "geometry": f"{args.frames}f@{args.height}p",
            "bits": args.bits, "depth_frac": args.depth_frac,
            "full_ms": round(results["off"] * 1e3, 1),
            "routed_ms": round(results["hard"] * 1e3, 1),
            "speedup": round(results["off"] / results["hard"], 3),
        }), flush=True)

    thresholds = [float(s) for s in str(args.cache_threshold).split(",")
                  if float(s) > 0.0]
    if thresholds:
        # composed arm: routing (+ optional int8_static) + step cache on a
        # real host-driven trajectory — one dispatch per step, under the
        # tunnel's ~60 s kill (see tools/bench_wan14b.py for the protocol).
        # The threshold is a TRACED scalar so a comma-list sweep shares one
        # compile.
        from vorta_tpu.ops.stepcache import init_step_cache
        from vorta_tpu.schedulers.flow_match import FlowMatchEulerSchedule

        schedule = FlowMatchEulerSchedule.create(args.steps,
                                                 shift=args.flow_shift)
        sigmas_t = np.asarray(schedule.sigmas)
        timesteps = np.asarray(schedule.timesteps)
        coeffs = (tuple(float(c) for c in
                        np.load(args.cache_poly)["coefficients"])
                  if args.cache_poly else None)
        seq = grid[0] * grid[1] * grid[2]

        @jax.jit
        def step_fn(state, qpair, lat, t, c_in, force, thr):
            m = nnx.merge(graphdef, state)
            out = m(lat.astype(jnp.bfloat16), t, text, mask, pooled,
                    guidance=guidance, attn_cfg=attn_r, routing_mode="hard",
                    quantized_blocks=qpair, mm_precision=mm,
                    act_scales=act_scales, step_cache=c_in,
                    cache_threshold=thr,
                    cache_force_compute=force, cache_coefficients=coeffs)
            return out.sample.astype(jnp.float32), out.step_cache

        def fresh_cache():
            return init_step_cache(b, seq, cfg.dim, cfg.dim, jnp.bfloat16)

        t0 = time.time()
        v, c0 = step_fn(state, qpair, latents.astype(jnp.float32),
                        jnp.full((b,), timesteps[0]),
                        fresh_cache(), jnp.asarray(True),
                        jnp.float32(thresholds[0]))
        jax.block_until_ready((v, c0))
        print(f"[13b] cache arm: compile+first {time.time() - t0:.0f}s",
              flush=True)

        full_ms = (results["off"] * 1e3 if "off" in results
                   else args.full_ms)  # e.g. the --fit_full measured fit
        for threshold in thresholds:
            thr = jnp.float32(threshold)
            lat = latents.astype(jnp.float32)
            cache_c = fresh_cache()
            times, skips = [], 0
            for i in range(args.steps):
                force = (i < 1) or (i == args.steps - 1)
                t0 = time.time()
                v, cache_c = step_fn(state, qpair, lat,
                                     jnp.full((b,), timesteps[i]), cache_c,
                                     jnp.asarray(force), thr)
                jax.block_until_ready((v, cache_c))
                dt = time.time() - t0
                skipped = bool(float(cache_c.acc) > 0.0)
                skips += skipped
                times.append(dt)
                lat = lat + float(sigmas_t[i + 1] - sigmas_t[i]) * v
                print(f"[13b] thr={threshold} step {i}: {dt * 1e3:.0f} ms "
                      f"{'SKIP' if skipped else 'compute'}", flush=True)
            mean_ms = float(np.mean(times) * 1e3)
            out = {
                "model": "hunyuan-13B", "arm": "routed+cache",
                "geometry": f"{args.frames}f@{args.height}p",
                "bits": args.bits, "mm": args.mm,
                "qk": "int8" if args.qk_int8 else "bf16",
                "cache_threshold": threshold,
                "cache_poly": bool(coeffs),
                "steps": args.steps, "skips": skips,
                "composed_ms_per_step": round(mean_ms, 1),
            }
            if full_ms:
                out["full_ms"] = round(full_ms, 1)
                out["full_ms_source"] = ("measured" if "off" in results
                                         else "fit_full")
                out["composed_speedup"] = round(full_ms / mean_ms, 3)
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
