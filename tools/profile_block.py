"""Op-level trace of one routed WanBlock forward at 720p (gap analysis).

Runs block_hard (trained-mix emulation, 5 lowres / 7 STA heads) under
jax.profiler, prints every device op's total duration and count, and
compares the busy-time sum against the scan-timed wall clock — the
difference is dispatch/scheduling gap, the ~11 ms/block item in STATUS's
per-block budget.

Usage: python tools/profile_block.py [--mode hard|off] [--iters 4] [--top 40]
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
from vorta_tpu.io.profiling import device_trace, op_durations


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="hard", choices=["hard", "off"])
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--mm", default="bf16", choices=["bf16", "int8"])
    args = ap.parse_args()

    cfg = WAN_1_3B
    attn = AttentionConfig(
        latent_shape=(20, 45, 80), sta_window=(3, 3, 3), sta_tile=(5, 9, 8),
        lowres_window=(2, 3, 2), block_q=1024, block_kv=1024, tau_sparse=0.3,
    )
    b, s, d = 1, attn.seq_len, cfg.dim
    x = jax.random.normal(jax.random.PRNGKey(0), (b, s, d), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (b, cfg.text_len, d), jnp.bfloat16)
    temb6 = jax.random.normal(jax.random.PRNGKey(5), (b, 6, d), jnp.float32)
    temb = jax.random.normal(jax.random.PRNGKey(6), (b, d), jnp.float32)

    from vorta_tpu.models.wan import WanBlock
    from vorta_tpu.ops.rope import rope_cos_sin

    block = WanBlock(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                     rngs=nnx.Rngs(0))
    bias = np.zeros(cfg.num_heads * 3, np.float32)
    for h in range(cfg.num_heads):
        bias[h * 3 + (1 if h < 5 else 2)] = 8.0
    block.router.linear.bias[...] = jnp.asarray(bias)
    cos, sin = rope_cos_sin(attn.latent_shape, cfg.head_dim, cfg.rope_theta)
    rope = (jnp.asarray(cos), jnp.asarray(sin))
    graphdef, bstate = nnx.split(block)

    iters = args.iters

    @jax.jit
    def run(bstate, x, ctx):
        def body(c, i):
            blk = nnx.merge(graphdef, bstate)
            out, _ = blk(x * (1 + 0.001 * i.astype(x.dtype)), ctx, temb6,
                         temb, rope, attn, args.mode)
            return c + out.astype(jnp.float32).mean(), ()

        cf, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                             jnp.arange(iters))
        return cf

    from vorta_tpu.ops.qmm import mm_precision

    with mm_precision(args.mm):
        float(run(bstate, x, ctx))  # compile + warm
        t0 = time.perf_counter()
        float(run(bstate, x, ctx))
        wall = (time.perf_counter() - t0) / iters
        print(f"block_{args.mode} wall: {wall * 1e3:.2f} ms/iter "
              f"({iters} iters in one jit)")

        with device_trace() as dtr:
            float(run(bstate, x, ctx))

    rows = op_durations(dtr, top=args.top)
    total = sum(r[1] for r in rows)
    print(f"\n{'op':60s} {'ms/iter':>9s} {'count':>6s}")
    for name, ms, cnt in rows:
        print(f"{name[:60]:60s} {ms / iters:9.3f} {cnt:6d}")
    print(f"\nbusy-sum (top {args.top}): {total / iters:.2f} ms/iter vs "
          f"wall {wall * 1e3:.2f} -> gap {(wall * 1e3 - total / iters):.2f}")


if __name__ == "__main__":
    main()
