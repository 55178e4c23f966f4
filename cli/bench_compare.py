#!/usr/bin/env python
"""Baseline-vs-routed comparison protocol (reference README.md:36-69).

Generates latents with full 3D attention and with routed sparse attention
from the SAME initial noise and conditioning, then reports per-variant
wall-clock and the PSNR between the two samples — the quality-vs-speed
trade the router training optimizes.  With trained routers, routed PSNR vs
baseline should be high; with random routers this mostly exercises the
protocol.

  python cli/bench_compare.py --model wan-1_3B --num_frames 77 \
      --height 720 --width 1280 --num_inference_steps 10
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from vorta_tpu.io.quality import (lpips, psnr, routing_mix, ssim,
                                  vbench_scaffold, weightfree_video_metrics)


def _load_cache_poly(args):
    if not args.cache_poly:
        return None
    return tuple(float(c) for c in np.load(args.cache_poly)["coefficients"])


def _arm_chunk(args, name: str) -> int:
    """Per-arm steps_per_dispatch: one int for all arms, or
    'baseline,vorta,cached' comma list."""
    parts = [int(x) for x in str(args.steps_per_dispatch).split(",")]
    if len(parts) == 1:
        return parts[0]
    idx = {"baseline": 0, "vorta": 1, "vorta_cached": 2}.get(name, 1)
    return parts[min(idx, len(parts) - 1)]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="wan-1_3B",
                   choices=["wan-1_3B", "wan-14B", "wan-tiny",
                            "hunyuan-13B", "hunyuan-tiny"])
    p.add_argument("--torch_checkpoint", default=None)
    p.add_argument("--router_checkpoint", default=None)
    p.add_argument("--router_npz", default=None,
                   help="router params npz from tools/train_bench_router.py")
    p.add_argument("--resume_dir", default=None)
    p.add_argument("--num_frames", type=int, default=77)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--num_inference_steps", type=int, default=10)
    p.add_argument("--guidance_scale", type=float, default=5.0)
    p.add_argument("--flow_shift", type=float, default=5.0)
    p.add_argument("--tau_sparse", type=float, default=0.3)
    p.add_argument("--cfg_batch", action="store_true",
                   help="CFG cond+uncond as one batch-2 forward (both arms)")
    p.add_argument("--mm", default="bf16", choices=["bf16", "int8", "int8_static"],
                   help="matmul precision for the ROUTED arm (baseline stays "
                        "bf16): measures the serving-mode quality cost — "
                        "int8_static self-calibrates static activation scales")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--output_dir", default="results/compare")
    p.add_argument("--cache_threshold", type=float, default=0.0,
                   help="adds a third arm (vorta_cached): routed + step-"
                        "residual caching (ops/stepcache.py) — reports its "
                        "wall-clock and quality vs the SAME baseline")
    p.add_argument("--cache_warmup", type=int, default=2)
    p.add_argument("--cache_poly", default=None,
                   help="npz from tools/fit_cache_poly.py; its fitted "
                        "polynomial rescales the raw temb indicator before "
                        "the threshold compare (TeaCache recipe)")
    p.add_argument("--tau_sweep", default=None,
                   help="comma list of tau_sparse values; per-tau routed "
                        "sample + quality metrics + routing mix")
    p.add_argument("--frontier_tau", default=None,
                   help="comma list of tau_sparse values for the joint "
                        "tau x cache_threshold frontier table")
    p.add_argument("--frontier_cache", default=None,
                   help="comma list of cache_threshold values (0 = cache "
                        "off) for the frontier; every (tau, thr) cell "
                        "reports speedup + PSNR/SSIM + weight-free video "
                        "metrics vs the same baseline")
    p.add_argument("--stepwise", action="store_true",
                   help="drive each arm through pipe.make_stepper (one jit "
                        "dispatch per --steps_per_dispatch denoise steps): "
                        "required on remote-tunneled TPUs where a full-scan "
                        "dispatch at 720p exceeds the ~60 s kill")
    p.add_argument("--steps_per_dispatch", default="1",
                   help="steps per stepper dispatch (must divide "
                        "num_inference_steps); >1 amortizes the per-dispatch "
                        "tunnel overhead (measured 3-7 s/dispatch remote) — "
                        "pick the largest value that keeps one dispatch "
                        "under the kill limit. Either one int for all arms "
                        "or 'baseline,vorta,cached' (e.g. 2,8,8: the slow "
                        "dense arm needs smaller dispatches)")
    p.add_argument("--lpips_weights", default=None,
                   help="local LPIPS net weights (no pretrained nets ship "
                        "in this environment; lpips is null without this)")
    args = p.parse_args(argv)

    import jax

    from vorta_tpu.parallel.mesh import pin_platform_from_env

    pin_platform_from_env()
    import jax.numpy as jnp
    from flax import nnx

    from vorta_tpu.config import WAN_1_3B, WAN_14B, WAN_TINY, AttentionConfig
    from vorta_tpu.geometry import WAN_GEOMETRY
    from vorta_tpu.models.wan import WanModel
    from vorta_tpu.pipelines.wan_t2v import SamplingConfig, WanT2VPipeline

    interpret = jax.default_backend() != "tpu"
    if args.model.startswith("hunyuan"):
        return _main_hunyuan(args, interpret)
    model_cfg = {"wan-1_3B": WAN_1_3B, "wan-14B": WAN_14B, "wan-tiny": WAN_TINY}[args.model]
    interpret = interpret or model_cfg.head_dim % 128 != 0
    grid = WAN_GEOMETRY.tokens((args.num_frames, args.height, args.width))
    if args.resume_dir and (Path(args.resume_dir) / "config.json").exists():
        attn_cfg = AttentionConfig.load(Path(args.resume_dir) / "config.json")
    elif args.model == "wan-tiny":
        attn_cfg = AttentionConfig(
            latent_shape=grid, sta_window=(3, 3, 1), sta_tile=(2, 2, 2),
            lowres_window=(2, 2, 2), block_q=16, block_kv=16,
            sta_block_q=8, sta_block_kv=8, tau_sparse=args.tau_sparse,
        )
    else:
        # flagship geometry (reference train.sh): STA tile [5,9,8] at 720p
        tile = (5, 9, 8) if grid[1] % 9 == 0 and grid[2] % 8 == 0 else (4, 6, 4)
        attn_cfg = AttentionConfig(
            latent_shape=grid, sta_window=(3, 3, 3), sta_tile=tile,
            lowres_window=(2, 3, 2), tau_sparse=args.tau_sparse,
        )

    dtype = jnp.float32 if args.model == "wan-tiny" else jnp.bfloat16
    model = WanModel(model_cfg, dtype=dtype, param_dtype=dtype, rngs=nnx.Rngs(0))
    if args.torch_checkpoint:
        from vorta_tpu.io.torch_import import load_wan_torch_weights

        load_wan_torch_weights(model, args.torch_checkpoint)
    if args.router_checkpoint:
        from vorta_tpu.io.torch_import import load_router_torch_checkpoint

        load_router_torch_checkpoint(model, args.router_checkpoint)
    if args.router_npz:
        from bench import load_router_npz
        from vorta_tpu.training.step import router_partition

        graphdef, router_state, frozen = router_partition(model)
        router_state = load_router_npz(router_state, args.router_npz)
        nnx.update(model, router_state)

    noise_probe = None  # set below; needed by calibration before pipe exists
    pe = jax.random.normal(
        jax.random.PRNGKey(args.seed + 1), (1, model_cfg.text_len, model_cfg.text_dim)
    )
    ne = jnp.zeros_like(pe)

    act_scales = None
    routed_mm = "bf16" if args.mm == "bf16" else "int8"
    if args.mm == "int8_static":
        # self-calibrate static activation scales under the routed serving
        # mode (same flow as bench.py / tools/calibrate_int8.py)
        gdef, state = nnx.split(model)
        probe_pipe = WanT2VPipeline(model, attn_cfg=attn_cfg, interpret=interpret)
        noise_probe = probe_pipe.prepare_latents(
            jax.random.PRNGKey(args.seed), 1, args.num_frames, args.height,
            args.width,
        )

        @jax.jit
        def calib_fwd(state, lat, ctx, t):
            m = nnx.merge(gdef, state)
            return m(lat, t, ctx, attn_cfg=attn_cfg, routing_mode="hard",
                     interpret=interpret, calibrate_mm=True).mm_calibration

        amax = None
        for ts in (200.0, 500.0, 800.0):
            a = jax.tree.map(
                np.asarray,
                calib_fwd(state, noise_probe, pe, jnp.full((1,), ts)),
            )
            amax = a if amax is None else {
                k: np.maximum(amax[k], a[k]) for k in amax
            }
        act_scales = {k: v / 127.0 for k, v in amax.items()}

    pipe = WanT2VPipeline(model, attn_cfg=attn_cfg, interpret=interpret,
                          act_scales=act_scales)
    noise = noise_probe if noise_probe is not None else pipe.prepare_latents(
        jax.random.PRNGKey(args.seed), 1, args.num_frames, args.height, args.width
    )

    def run_arm(run_pipe, sampling, noise_in, arm_name="vorta"):
        """One arm: jit'd scan loop, or host-driven stepper (--stepwise)."""
        if not args.stepwise:
            return run_pipe(noise_in, pe, ne, sampling=sampling)
        chunk = min(_arm_chunk(args, arm_name), args.num_inference_steps)
        init_carry, step_fn, n_steps = run_pipe.make_stepper(sampling, chunk=chunk)
        carry = init_carry(noise_in)
        sc_all = []
        for i in range(0, n_steps, chunk):
            carry, sc = step_fn(carry, i, pe, ne)
            if sampling.return_scores:
                # chunk>1 already carries a leading per-step axis
                sc_all.append(sc if chunk > 1 else sc[None])
        lat = carry[0]
        lat.block_until_ready()
        scores = jnp.concatenate(sc_all) if sc_all else None
        return lat, scores

    out_dir = Path(args.output_dir)
    results = {"mm_routed": args.mm, "stepwise": bool(args.stepwise)}
    arms = [("baseline", "off"), ("vorta", "hard")]
    if args.cache_threshold > 0.0:
        arms.append(("vorta_cached", "hard"))
    for name, mode in arms:
        cached = name == "vorta_cached"
        sampling = SamplingConfig(
            num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale,
            flow_shift=args.flow_shift,
            routing_mode=mode,
            return_scores=mode == "hard" and not cached,
            cfg_batch=args.cfg_batch,
            mm_precision=routed_mm if mode == "hard" else "bf16",
            cache_threshold=args.cache_threshold if cached else 0.0,
            cache_warmup=args.cache_warmup,
            cache_coefficients=_load_cache_poly(args) if cached else None,
        )
        # the fixed-seed sample (for the PSNR comparison)
        latents, scores = run_arm(pipe, sampling, noise, arm_name=name)
        latents.block_until_ready()
        if mode == "hard" and not cached and scores is not None:
            results["routing_mix"] = routing_mix(np.asarray(scores), args.tau_sparse)
        (out_dir / name).mkdir(parents=True, exist_ok=True)
        np.save(out_dir / name / "latents.npy", np.asarray(latents))
        # timing uses FRESH noise: the remote TPU tunnel value-caches
        # identical dispatches across processes, so repeated fixed-seed runs
        # return instantly and would fake the wall-clock
        import jax as _jax

        fresh = pipe.prepare_latents(
            _jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF),
            1, args.num_frames, args.height, args.width,
        )
        t0 = time.time()
        out, _ = run_arm(pipe, sampling, fresh, arm_name=name)
        out.block_until_ready()
        dt = time.time() - t0
        # record the resolved per-arm dispatch chunk: arms may use different
        # chunk sizes (--steps_per_dispatch a,b,c), so their s_per_step carry
        # different amounts of per-dispatch tunnel overhead (~3-7 s remote)
        chunk = (min(_arm_chunk(args, name), args.num_inference_steps)
                 if args.stepwise else args.num_inference_steps)
        results[name] = {"seconds": round(dt, 2),
                         "s_per_step": round(dt / args.num_inference_steps, 3),
                         "steps_per_dispatch": chunk}
        print(f"[{name}] {dt:.2f}s ({dt / args.num_inference_steps:.2f}s/step)", flush=True)

    a = np.load(out_dir / "baseline" / "latents.npy")
    b = np.load(out_dir / "vorta" / "latents.npy")
    results["psnr_vorta_vs_baseline_db"] = round(psnr(a, b), 2)
    results["ssim_vorta_vs_baseline"] = round(ssim(a, b), 4)
    results["lpips_vorta_vs_baseline"] = lpips(a, b, args.lpips_weights)
    results["weightfree_vorta"] = weightfree_video_metrics(b, a)
    results["vbench"] = vbench_scaffold()
    results["speedup"] = round(results["baseline"]["seconds"] / results["vorta"]["seconds"], 3)
    if args.cache_threshold > 0.0:
        c = np.load(out_dir / "vorta_cached" / "latents.npy")
        results["psnr_cached_vs_baseline_db"] = round(psnr(a, c), 2)
        results["ssim_cached_vs_baseline"] = round(ssim(a, c), 4)
        results["weightfree_cached"] = weightfree_video_metrics(c, a)
        results["speedup_cached"] = round(
            results["baseline"]["seconds"] / results["vorta_cached"]["seconds"], 3)

    if args.tau_sweep:
        # quality-vs-speedup trade as tau_sparse moves routed heads back to
        # full attention (reference fallback: wan.py:398-399)
        sweep = []
        for tau in (float(t) for t in args.tau_sweep.split(",")):
            import dataclasses as _dc

            cfg_t = _dc.replace(attn_cfg, tau_sparse=tau)
            pipe_t = WanT2VPipeline(model, attn_cfg=cfg_t, interpret=interpret,
                                    act_scales=act_scales)
            sampling = SamplingConfig(
                num_inference_steps=args.num_inference_steps,
                guidance_scale=args.guidance_scale,
                flow_shift=args.flow_shift,
                routing_mode="hard",
                return_scores=True,
                cfg_batch=args.cfg_batch,
                mm_precision=routed_mm,
            )
            lat_t, scores_t = run_arm(pipe_t, sampling, noise)
            lat_t.block_until_ready()
            fresh = pipe.prepare_latents(
                jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF),
                1, args.num_frames, args.height, args.width,
            )
            t0 = time.time()
            out, _ = run_arm(pipe_t, sampling, fresh)
            out.block_until_ready()
            dt = time.time() - t0
            lat_np = np.asarray(lat_t)
            row = {
                "tau": tau,
                "seconds": round(dt, 2),
                "speedup": round(results["baseline"]["seconds"] / dt, 3),
                "psnr_db": round(psnr(a, lat_np), 2),
                "ssim": round(ssim(a, lat_np), 4),
                "mix": routing_mix(np.asarray(scores_t), tau),
                **weightfree_video_metrics(lat_np, a),
            }
            sweep.append(row)
            print(f"[tau={tau}] {json.dumps(row)}", flush=True)
        results["tau_sweep"] = sweep

    if args.frontier_tau and args.frontier_cache:
        # joint tau_sparse x cache_threshold frontier: the two serving knobs
        # trade speed against quality on different axes (routing moves heads
        # to cheaper experts; caching skips whole steps) — the knee of this
        # table is the recommended serving point
        import dataclasses as _dc

        frontier = []
        for tau in (float(t) for t in args.frontier_tau.split(",")):
            cfg_t = _dc.replace(attn_cfg, tau_sparse=tau)
            pipe_t = WanT2VPipeline(model, attn_cfg=cfg_t, interpret=interpret,
                                    act_scales=act_scales)
            for thr in (float(t) for t in args.frontier_cache.split(",")):
                sampling = SamplingConfig(
                    num_inference_steps=args.num_inference_steps,
                    guidance_scale=args.guidance_scale,
                    flow_shift=args.flow_shift,
                    routing_mode="hard",
                    cfg_batch=args.cfg_batch,
                    mm_precision=routed_mm,
                    cache_threshold=thr,
                    cache_warmup=args.cache_warmup,
                    cache_coefficients=_load_cache_poly(args) if thr > 0 else None,
                )
                lat_t, _ = run_arm(pipe_t, sampling, noise)
                lat_t.block_until_ready()
                fresh = pipe.prepare_latents(
                    jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF),
                    1, args.num_frames, args.height, args.width,
                )
                t0 = time.time()
                out, _ = run_arm(pipe_t, sampling, fresh)
                out.block_until_ready()
                dt = time.time() - t0
                lat_np = np.asarray(lat_t)
                row = {
                    "tau": tau, "cache_threshold": thr,
                    "seconds": round(dt, 2),
                    "speedup": round(results["baseline"]["seconds"] / dt, 3),
                    "psnr_db": round(psnr(a, lat_np), 2),
                    "ssim": round(ssim(a, lat_np), 4),
                    **weightfree_video_metrics(lat_np, a),
                }
                frontier.append(row)
                print(f"[frontier tau={tau} thr={thr}] {json.dumps(row)}",
                      flush=True)
        results["frontier"] = frontier

    (out_dir / "summary.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results), flush=True)



def _main_hunyuan(args, interpret):
    """Hunyuan baseline-vs-routed comparison (same protocol, joint attention)."""
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from vorta_tpu.config import AttentionConfig
    from vorta_tpu.geometry import HUNYUAN_GEOMETRY
    from vorta_tpu.models.hunyuan import HUNYUAN_13B, HUNYUAN_TINY, HunyuanModel
    from vorta_tpu.pipelines.hunyuan_t2v import (
        HunyuanSamplingConfig,
        HunyuanT2VPipeline,
    )

    model_cfg = HUNYUAN_13B if args.model == "hunyuan-13B" else HUNYUAN_TINY
    interpret = interpret or model_cfg.head_dim % 128 != 0
    grid = HUNYUAN_GEOMETRY.tokens((args.num_frames, args.height, args.width))
    if args.resume_dir and (Path(args.resume_dir) / "config.json").exists():
        attn_cfg = AttentionConfig.load(Path(args.resume_dir) / "config.json")
    elif args.model == "hunyuan-tiny":
        attn_cfg = AttentionConfig(
            latent_shape=grid, sta_window=(3, 3, 1), sta_tile=(2, 2, 2),
            lowres_window=(2, 2, 2), block_q=16, block_kv=16,
            sta_block_q=8, sta_block_kv=8, tau_sparse=args.tau_sparse,
        )
    else:
        tile = (6, 9, 8) if grid[0] % 6 == 0 and grid[1] % 9 == 0 and grid[2] % 8 == 0 \
            else (2, 3, 2)
        attn_cfg = AttentionConfig(
            latent_shape=grid, sta_window=(3, 3, 3), sta_tile=tile,
            lowres_window=(2, 3, 2), tau_sparse=args.tau_sparse,
        )

    dtype = jnp.float32 if args.model == "hunyuan-tiny" else jnp.bfloat16
    model = HunyuanModel(model_cfg, dtype=dtype, param_dtype=dtype, rngs=nnx.Rngs(0))
    if args.torch_checkpoint:
        from vorta_tpu.io.torch_import import load_hunyuan_torch_weights

        load_hunyuan_torch_weights(model, args.torch_checkpoint)
    if args.router_checkpoint:
        from vorta_tpu.io.torch_import import load_hunyuan_router_torch_checkpoint

        load_hunyuan_router_torch_checkpoint(model, args.router_checkpoint)

    text = jax.random.normal(
        jax.random.PRNGKey(args.seed + 1), (1, model_cfg.text_len, model_cfg.text_dim)
    )
    mask = jnp.ones((1, model_cfg.text_len), bool)
    pooled = jax.random.normal(
        jax.random.PRNGKey(args.seed + 2), (1, model_cfg.pooled_dim)
    )

    act_scales = None
    routed_mm = "bf16" if args.mm == "bf16" else "int8"
    probe_pipe = HunyuanT2VPipeline(model, attn_cfg=attn_cfg, interpret=interpret)
    noise = probe_pipe.prepare_latents(
        jax.random.PRNGKey(args.seed), 1, args.num_frames, args.height, args.width
    )
    if args.mm == "int8_static":
        gdef, state = nnx.split(model)
        guidance = jnp.full((1,), args.guidance_scale * 1000.0)

        @jax.jit
        def calib_fwd(state, lat, text, mask, pooled, t):
            m = nnx.merge(gdef, state)
            return m(lat, t, text, mask, pooled, guidance=guidance,
                     attn_cfg=attn_cfg, routing_mode="hard",
                     interpret=interpret, calibrate_mm=True).mm_calibration

        amax = None
        for ts in (200.0, 500.0, 800.0):
            a = jax.tree.map(
                np.asarray,
                calib_fwd(state, noise, text, mask, pooled, jnp.full((1,), ts)),
            )
            amax = a if amax is None else {
                k: np.maximum(amax[k], a[k]) for k in amax
            }
        act_scales = {k: v / 127.0 for k, v in amax.items()}

    pipe = HunyuanT2VPipeline(model, attn_cfg=attn_cfg, interpret=interpret,
                              act_scales=act_scales)

    def run_arm(run_pipe, sampling, noise_in, arm_name="vorta"):
        """One arm: jit'd scan loop, or host-driven stepper (--stepwise)."""
        if not args.stepwise:
            return run_pipe(noise_in, text, mask, pooled, sampling=sampling)
        chunk = min(_arm_chunk(args, arm_name), args.num_inference_steps)
        init_carry, step_fn, n_steps = run_pipe.make_stepper(sampling, chunk=chunk)
        carry = init_carry(noise_in)
        for i in range(0, n_steps, chunk):
            carry, _ = step_fn(carry, i, text, mask, pooled)
        lat = carry[0]
        lat.block_until_ready()
        return lat

    out_dir = Path(args.output_dir)
    results = {"mm_routed": args.mm, "stepwise": bool(args.stepwise)}
    arms = [("baseline", "off"), ("vorta", "hard")]
    if args.cache_threshold > 0.0:
        arms.append(("vorta_cached", "hard"))
    for name, mode in arms:
        cached = name == "vorta_cached"
        sampling = HunyuanSamplingConfig(
            num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale,
            flow_shift=args.flow_shift,
            routing_mode=mode,
            mm_precision=routed_mm if mode == "hard" else "bf16",
            cache_threshold=args.cache_threshold if cached else 0.0,
            cache_warmup=args.cache_warmup,
            cache_coefficients=_load_cache_poly(args) if cached else None,
        )
        latents = run_arm(pipe, sampling, noise, arm_name=name)
        latents.block_until_ready()
        (out_dir / name).mkdir(parents=True, exist_ok=True)
        np.save(out_dir / name / "latents.npy", np.asarray(latents))
        fresh = pipe.prepare_latents(
            jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF),
            1, args.num_frames, args.height, args.width,
        )
        t0 = time.time()
        out = run_arm(pipe, sampling, fresh, arm_name=name)
        out.block_until_ready()
        dt = time.time() - t0
        # record the resolved per-arm dispatch chunk: arms may use different
        # chunk sizes (--steps_per_dispatch a,b,c), so their s_per_step carry
        # different amounts of per-dispatch tunnel overhead (~3-7 s remote)
        chunk = (min(_arm_chunk(args, name), args.num_inference_steps)
                 if args.stepwise else args.num_inference_steps)
        results[name] = {"seconds": round(dt, 2),
                         "s_per_step": round(dt / args.num_inference_steps, 3),
                         "steps_per_dispatch": chunk}
        print(f"[{name}] {dt:.2f}s ({dt / args.num_inference_steps:.2f}s/step)", flush=True)

    a = np.load(out_dir / "baseline" / "latents.npy")
    b = np.load(out_dir / "vorta" / "latents.npy")
    results["psnr_vorta_vs_baseline_db"] = round(psnr(a, b), 2)
    results["ssim_vorta_vs_baseline"] = round(ssim(a, b), 4)
    results["lpips_vorta_vs_baseline"] = lpips(a, b, args.lpips_weights)
    results["weightfree_vorta"] = weightfree_video_metrics(b, a)
    results["vbench"] = vbench_scaffold()
    results["speedup"] = round(results["baseline"]["seconds"] / results["vorta"]["seconds"], 3)
    if args.cache_threshold > 0.0:
        c = np.load(out_dir / "vorta_cached" / "latents.npy")
        results["psnr_cached_vs_baseline_db"] = round(psnr(a, c), 2)
        results["ssim_cached_vs_baseline"] = round(ssim(a, c), 4)
        results["weightfree_cached"] = weightfree_video_metrics(c, a)
        results["speedup_cached"] = round(
            results["baseline"]["seconds"] / results["vorta_cached"]["seconds"], 3)
    (out_dir / "summary.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
