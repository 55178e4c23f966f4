"""Calibrate static int8 activation scales (ops/qmm.py).

Runs a few forwards with ``calibrate_mm=True`` — every QLinear site records
max|x| per layer through the block scan — max-reduces over calibration
points, and saves ``{site: (num_layers,) scale}`` (amax/127) to an .npz that
``cli/sample.py --act_scales`` / ``bench.py --mm int8_static`` /
``WanT2VPipeline(act_scales=...)`` consume.

With real checkpoints, pass ``--router`` (and import DiT weights into the
model first — io/torch_import.py); calibration inputs should then be real
prompt embeds/latents.  In this environment the tool validates the mechanism
on random weights and synthetic inputs.

Reference analog: none — the reference serves bf16/fp16 only; static W8A8
is a TPU-native serving mode this framework adds.

Run: python tools/calibrate_int8.py --geom 720p --out assets/act_scales.npz
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from vorta_tpu.config import WAN_1_3B, AttentionConfig
from vorta_tpu.models.wan import WanModel
from vorta_tpu.training.step import router_partition


def bench_attn_cfg(geom: str) -> AttentionConfig:
    # identical to bench.py's geometries
    if geom == "720p":
        return AttentionConfig(
            latent_shape=(20, 45, 80), sta_window=(3, 3, 3), sta_tile=(5, 9, 8),
            lowres_window=(2, 3, 2), block_q=1024, block_kv=1024, tau_sparse=0.3,
        )
    return AttentionConfig(
        latent_shape=(20, 30, 52), sta_window=(3, 3, 3), sta_tile=(4, 6, 4),
        lowres_window=(2, 3, 2), block_q=1024, block_kv=1024,
        sta_block_q=480, sta_block_kv=576, tau_sparse=0.3,
    )


def calibrate_wan(model_call, points):
    """Max-reduce mm_calibration over (latents, timestep, context) points.

    ``model_call(lat, t, ctx) -> {site: (L,) amax}``; returns {site: (L,)}.
    """
    amax = None
    for lat, t, ctx in points:
        a = jax.tree.map(np.asarray, model_call(lat, t, ctx))
        amax = a if amax is None else {
            k: np.maximum(amax[k], a[k]) for k in amax
        }
    return amax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geom", default="720p", choices=["720p", "480p"])
    ap.add_argument("--routing", default="hard", choices=["hard", "off"],
                    help="calibrate under the serving routing mode")
    ap.add_argument("--router", default="assets/bench_router_wan1_3b.npz")
    ap.add_argument("--timesteps", default="100,400,700,950",
                    help="denoise timesteps to sample activations at")
    ap.add_argument("--out", default="assets/act_scales_wan1_3b.npz")
    args = ap.parse_args()

    attn = bench_attn_cfg(args.geom)
    px = {"720p": (90, 160), "480p": (60, 104)}[args.geom]
    model = WanModel(WAN_1_3B, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                     rngs=nnx.Rngs(0))
    graphdef, router_state, frozen_state = router_partition(model)
    if args.routing == "hard" and os.path.exists(args.router):
        from bench import load_router_npz  # same loader as the bench

        router_state = load_router_npz(router_state, args.router)

    b = 1
    interpret = jax.default_backend() != "tpu"

    @jax.jit
    def calib_fwd(rstate, fstate, lat, t, ctx):
        m = nnx.merge(graphdef, rstate, fstate)
        out = m(lat, t, ctx, attn_cfg=attn, routing_mode=args.routing,
                interpret=interpret, calibrate_mm=True)
        return out.mm_calibration

    key = jax.random.PRNGKey(0)
    ctx = jax.random.normal(
        jax.random.PRNGKey(1), (b, WAN_1_3B.text_len, WAN_1_3B.text_dim),
        jnp.bfloat16,
    )
    points = []
    for i, ts in enumerate(float(x) for x in args.timesteps.split(",")):
        lat = jax.random.normal(
            jax.random.fold_in(key, i),
            (b, 20, px[0], px[1], WAN_1_3B.in_channels), jnp.bfloat16,
        )
        points.append((lat, jnp.full((b,), ts), ctx))

    t0 = time.time()
    amax = calibrate_wan(
        lambda lat, t, c: calib_fwd(router_state, frozen_state, lat, t, c),
        points,
    )
    scales = {k: (v / 127.0).astype(np.float32) for k, v in amax.items()}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(args.out, **scales)
    print(f"calibrated {len(scales)} sites x {len(next(iter(scales.values())))} "
          f"layers over {len(points)} points in {time.time() - t0:.1f}s -> {args.out}")
    for k in sorted(scales):
        v = scales[k]
        print(f"  {k}: scale range [{v.min():.4g}, {v.max():.4g}]")


if __name__ == "__main__":
    main()
