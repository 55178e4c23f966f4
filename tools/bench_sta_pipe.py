"""v5 (manual-DMA) vs v6 (grid-pipelined) row-dense STA kernels on real TPU.

Usage: python tools/bench_sta_pipe.py [--geom wan|hunyuan] [--which v5|v6|both]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vorta_tpu.ops.sta_row import sta_row_attention
from vorta_tpu.ops.sta_pipe import sta_pipe_attention


def device_seconds(fn, *args, iters: int = 4) -> float:
    @jax.jit
    def run(*args):
        def body(c, i):
            return fn(c, i, *args), ()

        cf, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(iters))
        return cf

    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geom", default="wan", choices=["wan", "hunyuan", "wan480"])
    ap.add_argument("--which", default="both")
    ap.add_argument("--variant", default="full", choices=["full", "dots", "qk", "sT"])
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    if args.geom == "wan":
        latent, tile, h, lt = (20, 45, 80), (5, 9, 8), 12, 0
    elif args.geom == "wan480":  # tw % 8 != 0 -> masked-width variant
        latent, tile, h, lt = (20, 30, 52), (4, 6, 4), 12, 0
    else:
        latent, tile, h, lt = (30, 45, 80), (6, 9, 8), 24, 256
    b, d = 1, 128
    s = latent[0] * latent[1] * latent[2]
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d), jnp.bfloat16)
    active = jnp.ones((h,), jnp.int32)
    extra = {}
    if lt:
        extra = dict(
            text_k=jax.random.normal(jax.random.PRNGKey(3), (b, h, lt, d), jnp.bfloat16),
            text_v=jax.random.normal(jax.random.PRNGKey(4), (b, h, lt, d), jnp.bfloat16),
            text_bias=jnp.where(jnp.arange(lt) < 226, 0.0, -1e30).astype(jnp.float32),
        )
    kw = dict(latent_shape=latent, tile=tile, window=(3, 3, 3), **extra)
    print(f"geom {args.geom}: S={s} H={h} text={lt}", flush=True)

    def perturb(x, i):
        return x * (1.0 + 0.001 * i.astype(jnp.bfloat16))

    for name, fn in [("v5_row", sta_row_attention), ("v6_pipe", sta_pipe_attention)]:
        if args.which not in ("both", name[:2]):
            continue
        xkw = dict(kw)
        if name == "v6_pipe" and args.variant != "full":
            xkw["variant"] = args.variant

        def body(c, i, q, k, v, fn=fn, xkw=xkw):
            out = fn(perturb(q, i), k, v, active, **xkw)
            return c + out.astype(jnp.float32).mean()

        sec = device_seconds(body, q, k, v, iters=args.iters)
        print(f"{name:8s} {sec * 1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
