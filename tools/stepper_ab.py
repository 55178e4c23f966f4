"""A/B forensic: in-scan pipeline loop vs make_stepper at 720p.

Round-4 observation: the host-driven stepper measures ~2x the in-scan
per-step cost for the ROUTED arm at 720p (10.8 vs 5.29 s/step) while the
dense baseline inflates only ~11% and 480p shows scan == stepper exactly.
This isolates the variable: same SamplingConfig, same steps, same noise —
one axis per run (loop kind, return_scores, chunk).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--num_frames", type=int, default=77)
    ap.add_argument("--routing", default="hard", choices=["hard", "off"])
    ap.add_argument("--scores", action="store_true")
    ap.add_argument("--loop", default="scan", choices=["scan", "stepper"])
    ap.add_argument("--chunk", type=int, default=0,
                    help="stepper chunk (0 = all steps in one dispatch)")
    ap.add_argument("--guidance", type=float, default=5.0)
    ap.add_argument("--router_npz", default="assets/bench_router_wan1_3b.npz")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from bench import load_router_npz
    from vorta_tpu.config import AttentionConfig
    from vorta_tpu.models.wan import WAN_1_3B, WanModel
    from vorta_tpu.pipelines.wan_t2v import SamplingConfig, WanT2VPipeline
    from vorta_tpu.training.step import router_partition

    cfg = WAN_1_3B
    t0 = time.time()
    model = WanModel(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                     rngs=nnx.Rngs(0))
    if args.router_npz and os.path.exists(args.router_npz):
        gdef, router_state, frozen = router_partition(model)
        router_state = load_router_npz(router_state, args.router_npz)
        nnx.update(model, router_state)
    lat_t = (args.num_frames - 1) // 4 + 1
    grid = (lat_t // cfg.patch_size[0],
            args.height // 8 // cfg.patch_size[1],
            args.width // 8 // cfg.patch_size[2])
    attn_cfg = AttentionConfig(
        latent_shape=grid, sta_window=(3, 3, 3), sta_tile=(5, 9, 8),
        lowres_window=(2, 3, 2), block_q=1024, block_kv=1024,
    )
    pipe = WanT2VPipeline(model, attn_cfg=attn_cfg)
    pe = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim))
    ne = jnp.zeros_like(pe)
    noise = pipe.prepare_latents(jax.random.PRNGKey(0), 1, args.num_frames,
                                 args.height, args.width)
    print(f"[ab] setup {time.time() - t0:.0f}s", flush=True)

    sampling = SamplingConfig(
        num_inference_steps=args.steps,
        guidance_scale=args.guidance,
        routing_mode=args.routing,
        return_scores=args.scores,
    )

    def run_scan(noise_in):
        out = pipe(noise_in, pe, ne, sampling=sampling)
        lat = out[0] if isinstance(out, tuple) else out
        jax.block_until_ready(lat)
        return lat

    def run_stepper(noise_in):
        chunk = args.chunk or args.steps
        init_carry, step_fn, n_steps = pipe.make_stepper(sampling, chunk=chunk)
        carry = init_carry(noise_in)
        for i in range(0, n_steps, chunk):
            carry, _sc = step_fn(carry, i, pe, ne)
        jax.block_until_ready(carry[0])
        return carry[0]

    run = run_scan if args.loop == "scan" else run_stepper
    t0 = time.time()
    run(noise)
    print(f"[ab] compile+first {time.time() - t0:.0f}s", flush=True)
    # perturb to defeat the tunnel's value cache on identical dispatches
    noise2 = noise * (1.0 + 1e-6)
    t0 = time.time()
    run(noise2)
    dt = time.time() - t0
    print(f"[ab] loop={args.loop} chunk={args.chunk or args.steps} "
          f"routing={args.routing} scores={args.scores} "
          f"steps={args.steps}: {dt:.2f}s total, "
          f"{dt / args.steps:.3f}s/step", flush=True)


if __name__ == "__main__":
    main()
