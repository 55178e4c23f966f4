"""Hunyuan routed-vs-full denoise forward at the real 720p x 117f geometry.

HunyuanVideo-13B (26 GB bf16) does not fit a single v5e's 16 GB HBM, so this
measures a depth-reduced model with the REAL per-layer geometry — dim 3072,
24 heads x 128, joint sequence 108,000 video + 256 text tokens, STA tile
[6,9,8] (train.sh), lowres window [2,3,2] — and reports both the measured
time and the depth-normalized extrapolation to the full 20 dual + 40 single
stack (attention/FFN cost is per-layer linear; BASELINE config #3's single
chip is a v5p with the HBM for the full model).

Router mix for "routed": the head proportions the Wan bench router converged
to under the reference training recipe (0% full / 39% lowres / 61% STA),
assigned per head.  Usage: python tools/bench_hunyuan.py [--dual N --single M]
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

from vorta_tpu.config import AttentionConfig
from vorta_tpu.models.hunyuan import HunyuanModel, HunyuanModelConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dual", type=int, default=2)
    ap.add_argument("--single", type=int, default=4)
    ap.add_argument("--frames", type=int, default=117)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    cfg = HunyuanModelConfig(dual_layers=args.dual, single_layers=args.single)
    lat_t = (args.frames - 1) // 4 + 1  # causal VAE 4x temporal
    grid = (lat_t, 45, 80)
    attn = AttentionConfig(
        latent_shape=grid,
        sta_window=(3, 3, 3),
        sta_tile=(6, 9, 8),
        lowres_window=(2, 3, 2),
        block_q=1024,
        block_kv=1024,
        tau_sparse=0.3,
    )
    model = HunyuanModel(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                         rngs=nnx.Rngs(0))

    # pin every block's router to the target mix: zero weights, biased logits
    # (Router = SiLU -> Linear(dim, heads*3) -> softmax, logits (H, 3))
    n_low = round(0.39 * cfg.num_heads)
    ids = np.array([1] * n_low + [2] * (cfg.num_heads - n_low), np.int32)
    bias = np.full((cfg.num_heads, 3), -10.0, np.float32)
    bias[np.arange(cfg.num_heads), ids] = 10.0
    graphdef, state = nnx.split(model)
    flat = jax.tree_util.tree_flatten_with_path(state)
    leaves = []
    for key_path, leaf in flat[0]:
        key = jax.tree_util.keystr(key_path)
        if "router" in key and "bias" in key:
            # leaves are layer-stacked: broadcast the (H*3,) bias to the
            # leaf's (num_layers, H*3) shape
            leaves.append(jnp.broadcast_to(
                jnp.asarray(bias.reshape(-1), leaf.dtype), leaf.shape))
        elif "router" in key and "kernel" in key:
            leaves.append(jnp.zeros_like(leaf))
        else:
            leaves.append(leaf)
    state = jax.tree_util.tree_unflatten(flat[1], leaves)

    b = 1
    latents = jax.random.normal(
        jax.random.PRNGKey(0),
        (b, lat_t, 90, 160, cfg.in_channels), jnp.bfloat16)
    text = jax.random.normal(
        jax.random.PRNGKey(1), (b, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    pooled = jax.random.normal(jax.random.PRNGKey(2), (b, cfg.pooled_dim), jnp.bfloat16)
    mask = jnp.broadcast_to((jnp.arange(cfg.text_len) < 226)[None], (b, cfg.text_len))

    def fwd(c, i, state, lat, ctx, mode):
        m = nnx.merge(graphdef, state)
        t = jnp.full((b,), 500.0) + i.astype(jnp.float32)
        out = m(lat, t, ctx, mask, pooled, guidance=jnp.asarray([6000.0]),
                attn_cfg=attn, routing_mode=mode)
        return c + out.sample.astype(jnp.float32).mean()

    def device_seconds(fn, *a, iters=args.iters):
        @jax.jit
        def run(*a):
            def body(c, i):
                return fn(c, i, *a), ()
            cf, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                 jnp.arange(iters))
            return cf
        float(run(*a))
        t0 = time.perf_counter()
        float(run(*a))
        return (time.perf_counter() - t0) / iters

    full_s = device_seconds(lambda c, i, s, l, x: fwd(c, i, s, l, x, "off"),
                            state, latents, text)
    routed_s = device_seconds(lambda c, i, s, l, x: fwd(c, i, s, l, x, "hard"),
                              state, latents, text)
    layers = args.dual + args.single
    scale_to_full = (20 + 40) / layers
    print(
        f"hunyuan {args.dual}d+{args.single}s 720p x {args.frames}f "
        f"({grid[0] * grid[1] * grid[2]} + {cfg.text_len} tokens): "
        f"full {full_s * 1e3:.0f} ms, routed {routed_s * 1e3:.0f} ms "
        f"({full_s / routed_s:.2f}x); extrapolated 20d+40s: "
        f"full {full_s * scale_to_full:.2f} s, routed {routed_s * scale_to_full:.2f} s",
        flush=True,
    )


if __name__ == "__main__":
    main()
