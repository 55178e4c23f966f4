#!/usr/bin/env python
"""Fit the step-cache rescale polynomial (ops/stepcache.py, TeaCache recipe).

The cache's skip indicator is the rel-L1 distance between adjacent steps'
timestep-embedding tensors; what we actually want to bound is the rel-L1
change of the BLOCK-STACK OUTPUT delta. TeaCache bridges the two with a
fitted polynomial: run a short sampling trajectory, record per step
  x = rel_l1(ind_t, ind_{t-1})        (the cheap indicator)
  y = rel_l1(resid_t, resid_{t-1})    (the expensive truth)
and fit y ~ poly(x). Serve the coefficients via
``SamplingConfig(cache_coefficients=tuple(np.load(out)["coefficients"]))``.

With random weights this validates the mechanics; rerun against real
checkpoints (--torch_checkpoint) to get production coefficients.

  python tools/fit_cache_poly.py --model wan-tiny --steps 8 --degree 4 \
      --out /tmp/cache_poly.npz
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="wan-tiny",
                   choices=["wan-tiny", "wan-1_3B", "wan-14B"])
    p.add_argument("--torch_checkpoint", default=None)
    p.add_argument("--router", default=None,
                   help="trained-router npz (tools/train_bench_router.py "
                        "format, e.g. assets/bench_router_wan1_3b.npz) so the "
                        "probed trajectory uses the served routing mix")
    p.add_argument("--num_frames", type=int, default=13)
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--steps", type=int, default=12)
    p.add_argument("--flow_shift", type=float, default=5.0,
                   help="match the serving scheduler shift (cli/sample.py "
                        "--flow_shift) so the probed trajectory's timestep "
                        "spacing equals the served one")
    p.add_argument("--guidance_scale", type=float, default=1.0,
                   help="probe under CFG (>1): per-step cond+uncond forwards, "
                        "CFG-combined velocity drives the trajectory; the "
                        "cond arm's indicator/residual are recorded (serving "
                        "caches are per-CFG-arm)")
    p.add_argument("--degree", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="results/cache_poly.npz")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from vorta_tpu.config import WAN_1_3B, WAN_14B, WAN_TINY, AttentionConfig
    from vorta_tpu.geometry import WAN_GEOMETRY
    from vorta_tpu.models.wan import WanModel
    from vorta_tpu.ops.stepcache import rel_l1
    from vorta_tpu.pipelines.wan_t2v import WanT2VPipeline
    from vorta_tpu.schedulers.flow_match import FlowMatchEulerSchedule

    cfg = {"wan-tiny": WAN_TINY, "wan-1_3B": WAN_1_3B, "wan-14B": WAN_14B}[args.model]
    interpret = jax.default_backend() != "tpu" or cfg.head_dim % 128 != 0
    grid = WAN_GEOMETRY.tokens((args.num_frames, args.height, args.width))
    if args.model == "wan-tiny":
        attn = AttentionConfig(latent_shape=grid, sta_window=(3, 3, 1),
                               sta_tile=(2, 2, 2), lowres_window=(2, 2, 2),
                               block_q=16, block_kv=16, sta_block_q=8,
                               sta_block_kv=8)
    else:
        tile = (5, 9, 8) if grid[1] % 9 == 0 and grid[2] % 8 == 0 else (4, 6, 4)
        attn = AttentionConfig(latent_shape=grid, sta_window=(3, 3, 3),
                               sta_tile=tile, lowres_window=(2, 3, 2))
    dtype = jnp.float32 if args.model == "wan-tiny" else jnp.bfloat16
    model = WanModel(cfg, dtype=dtype, param_dtype=dtype, rngs=nnx.Rngs(0))
    if args.torch_checkpoint:
        from vorta_tpu.io.torch_import import load_wan_torch_weights

        load_wan_torch_weights(model, args.torch_checkpoint)
    if args.router:
        from vorta_tpu.training.step import router_partition

        _gd, router_state, frozen_state = router_partition(model)
        from bench import load_router_npz

        router_state = load_router_npz(router_state, args.router)
        model = nnx.merge(_gd, router_state, frozen_state)

    pipe = WanT2VPipeline(model, attn_cfg=attn, interpret=interpret)
    x = pipe.prepare_latents(jax.random.PRNGKey(args.seed), 1,
                             args.num_frames, args.height, args.width)
    pe = jax.random.normal(jax.random.PRNGKey(args.seed + 1),
                           (1, cfg.text_len, cfg.text_dim))
    schedule = FlowMatchEulerSchedule.create(args.steps, shift=args.flow_shift)
    sigmas = np.asarray(schedule.sigmas)
    timesteps = np.asarray(schedule.timesteps)

    graphdef, state = nnx.split(model)

    @jax.jit
    def fwd(state, lat, t):
        m = nnx.merge(graphdef, state)
        # hidden-state delta across the block stack = the cached residual;
        # temb6 = the skip indicator (same tensors stepcache.py uses)
        out = m(lat.astype(m.dtype), t, pe, attn_cfg=attn,
                routing_mode="hard", interpret=interpret,
                return_hidden_delta=True)
        return out.sample.astype(jnp.float32), out.hidden_delta, out.temb_indicator

    @jax.jit
    def fwd_uncond(state, lat, t):
        m = nnx.merge(graphdef, state)
        out = m(lat.astype(m.dtype), t, neg_pe, attn_cfg=attn,
                routing_mode="hard", interpret=interpret)
        return out.sample.astype(jnp.float32), None, None

    neg_pe = jnp.zeros_like(pe)
    xs, ys = [], []
    prev_ind = prev_resid = None
    lat = x.astype(jnp.float32)
    g = args.guidance_scale
    for i in range(args.steps):
        t = jnp.full((1,), timesteps[i])
        v, resid, ind = fwd(state, lat, t)
        if g > 1.0:
            # CFG trajectory: the uncond forward only steers the latents;
            # the recorded (indicator, residual) stay the cond arm's, which
            # is what the per-arm serving cache sees.
            v_u, _, _ = fwd_uncond(state, lat, t)
            v = v_u + g * (v - v_u)
        if prev_ind is not None:
            xs.append(float(rel_l1(ind, prev_ind)))
            ys.append(float(rel_l1(resid.astype(jnp.float32),
                                   prev_resid.astype(jnp.float32))))
        prev_ind, prev_resid = ind, resid
        lat = lat + (sigmas[i + 1] - sigmas[i]) * v
        print(f"step {i}: ind_dist={xs[-1] if xs else None} "
              f"resid_dist={ys[-1] if ys else None}", flush=True)

    coeffs = np.polyfit(np.asarray(xs), np.asarray(ys), args.degree)
    pred = np.polyval(coeffs, np.asarray(xs))
    r2 = 1.0 - np.sum((pred - ys) ** 2) / max(np.sum((ys - np.mean(ys)) ** 2), 1e-12)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    np.savez(args.out, coefficients=coeffs, indicator=np.asarray(xs),
             residual=np.asarray(ys))
    print(json.dumps({"coefficients": [float(c) for c in coeffs],
                      "r2": round(float(r2), 4), "points": len(xs),
                      "out": args.out}), flush=True)


if __name__ == "__main__":
    main()
