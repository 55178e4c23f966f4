"""Op-level (HLO) breakdown of hot paths via jax.profiler traces.

Usage: python tools/profile_ops.py --which pool|model_routed|model_full|sta
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import nnx

from vorta_tpu.config import WAN_1_3B, AttentionConfig
from vorta_tpu.io.profiling import profile_call
from vorta_tpu.ops.experts import FULL, LOWRES, STA, lowres_groups_for


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="pool")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--layers", type=int, default=0,
                    help="depth-reduce the model (0 = full); per-block op mix is identical")
    args = ap.parse_args()

    attn = AttentionConfig(
        latent_shape=(20, 45, 80), sta_window=(3, 3, 3), sta_tile=(5, 9, 8),
        lowres_window=(2, 3, 2), block_q=1024, block_kv=1024, tau_sparse=0.3,
    )
    b, h, d = 1, 12, 128
    s = attn.seq_len
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d), jnp.bfloat16)

    if args.which == "pool":
        from vorta_tpu.ops.coreset import pool_by_similarity, unpool_by_similarity

        groups = lowres_groups_for(attn)

        @jax.jit
        def fn(q, k, v):
            pq, m = pool_by_similarity(q, groups)
            pk, _ = pool_by_similarity(k, groups, m)
            pv, _ = pool_by_similarity(v, groups, m)
            return unpool_by_similarity(pq + pk + pv, groups, m)

        rows = profile_call(fn, q, k, v, top=args.top)
    elif args.which == "sta":
        from vorta_tpu.ops.sta_window import sta_window_attention

        active = jnp.ones((h,), jnp.int32)

        @jax.jit
        def fn(q, k, v):
            return sta_window_attention(
                q, k, v, active, latent_shape=attn.latent_shape,
                tile=attn.sta_tile, window=attn.sta_window)

        rows = profile_call(fn, q, k, v, top=args.top)
    else:
        from vorta_tpu.models.wan import WanModel
        from vorta_tpu.training.step import router_partition

        import dataclasses

        mcfg = WAN_1_3B
        if args.layers:
            mcfg = dataclasses.replace(mcfg, num_layers=args.layers)
        model = WanModel(mcfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                         rngs=nnx.Rngs(0))
        graphdef, rstate, fstate = router_partition(model)
        bench_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ckpt = os.path.join(bench_dir, "assets", "bench_router_wan1_3b.npz")
        if os.path.exists(ckpt) and not args.layers:
            sys.path.insert(0, bench_dir)
            from bench import load_router_npz

            rstate = load_router_npz(rstate, ckpt)
        latents = jax.random.normal(
            jax.random.PRNGKey(0), (b, 20, 90, 160, mcfg.in_channels), jnp.bfloat16)
        context = jax.random.normal(
            jax.random.PRNGKey(1), (b, mcfg.text_len, mcfg.text_dim), jnp.bfloat16)
        mode = "hard" if args.which == "model_routed" else "off"

        @jax.jit
        def fn(rstate, fstate, lat, ctx):
            m = nnx.merge(graphdef, rstate, fstate)
            t = jnp.full((b,), 500.0)
            return m(lat, t, ctx, attn_cfg=attn, routing_mode=mode).sample

        rows = profile_call(fn, rstate, fstate, latents, context, top=args.top)

    import re

    cats, total = {}, 0.0
    for name, ms, cnt in rows:
        print(f"{ms:10.2f} ms  x{cnt:<5d} {name[:110]}")
        if "$" in name or "jit_" in name or ".py" in name or "Pjit" in name:
            continue
        cat = re.sub(r"[.\d]+$", "", name)
        cats[cat] = cats.get(cat, 0.0) + ms
        total += ms
    print("--- by category ---")
    for kk, vv in sorted(cats.items(), key=lambda x: -x[1]):
        print(f"{vv:8.2f} ms  {kk}")
    print(f"{total:8.2f} ms TOTAL")


if __name__ == "__main__":
    main()
