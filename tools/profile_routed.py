"""Component-level timing of the routed attention path at 720p Wan geometry.

Times each piece (full kernel, STA branch, lowres branch, pooling alone,
relayouts alone, mixed routing) with lax.scan-inside-one-jit and perturbed
inputs, which is the only timing the TPU tunnel doesn't value-cache.

Usage: python tools/profile_routed.py [--geom 720p|480p] [--which all|...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vorta_tpu.config import AttentionConfig
from vorta_tpu.ops.experts import FULL, LOWRES, STA, lowres_groups_for


def device_seconds(fn, *args, iters: int = 4) -> float:
    @jax.jit
    def run(*args):
        def body(c, i):
            return fn(c, i, *args), ()

        cf, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(iters))
        return cf

    float(run(*args))  # compile + warm
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geom", default="720p", choices=["720p", "480p"])
    ap.add_argument("--which", default="all")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    if args.geom == "720p":
        attn = AttentionConfig(
            latent_shape=(20, 45, 80), sta_window=(3, 3, 3), sta_tile=(5, 9, 8),
            lowres_window=(2, 3, 2), block_q=1024, block_kv=1024, tau_sparse=0.3,
        )
    else:
        attn = AttentionConfig(
            latent_shape=(20, 30, 52), sta_window=(3, 3, 3), sta_tile=(4, 6, 4),
            lowres_window=(2, 3, 2), block_q=1024, block_kv=1024, tau_sparse=0.3,
        )
    b, h, d = 1, 12, 128
    s = attn.seq_len
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d), jnp.bfloat16)
    print(f"geometry {args.geom}: S={s} tokens/tile={attn.tokens_per_tile} "
          f"pooled={lowres_groups_for(attn).pooled_length}")

    def perturb(x, i):
        return x * (1.0 + 0.001 * i.astype(jnp.float32))

    def timed(name, fn):
        # q/k/v passed as jit args (closure constants would be shipped in the
        # compile request body and blow the tunnel's size limit)
        if args.which != "all" and args.which != name:
            return
        sec = device_seconds(fn, q, k, v, iters=args.iters)
        print(f"{name:26s} {sec * 1e3:9.2f} ms", flush=True)

    from vorta_tpu.ops.routed_fused import fused_routed_attention
    from vorta_tpu.ops.coreset import pool_by_similarity, unpool_by_similarity
    from vorta_tpu.ops.layout import tile_sequence, untile_sequence
    from vorta_tpu.ops.experts import full_attention

    groups = lowres_groups_for(attn)

    def mk_routed(ids):
        ids = jnp.asarray(ids, jnp.int32)

        def f(c, i, q, k, v):
            out = fused_routed_attention(perturb(q, i), k, v, ids, attn)
            return c + out.astype(jnp.float32).mean()

        return f

    timed("full_kernel", lambda c, i, q, k, v: c + full_attention(
        perturb(q, i), k, v, attn).astype(jnp.float32).mean())
    timed("routed_all_full", mk_routed([FULL] * h))
    timed("routed_all_lowres", mk_routed([LOWRES] * h))
    timed("routed_all_sta", mk_routed([STA] * h))
    timed("routed_mixed_336", mk_routed([FULL] * 3 + [LOWRES] * 3 + [STA] * 6))
    # trained-router head mix (0% full / 39% lowres / 61% STA);
    # VORTA_ROUTED_DISPATCH=masked switches per-head lax.switch to
    # one-launch-per-expert participation masking
    timed("routed_mixed_5L7S", mk_routed([LOWRES] * 5 + [STA] * 7))

    def pool_only(c, i, q, k, v):
        pq, m = pool_by_similarity(perturb(q, i), groups)
        pk, _ = pool_by_similarity(k, groups, m)
        pv, _ = pool_by_similarity(v, groups, m)
        out = unpool_by_similarity(pq + pk + pv, groups, m)
        return c + out.astype(jnp.float32).mean()

    timed("pool_unpool_qkv", pool_only)

    from vorta_tpu.ops.coreset_pallas import pool_qkv as pool_qkv_pl
    from vorta_tpu.ops.coreset_pallas import unpool as unpool_pl

    def pool_pallas_picks(c, i, q, k, v):
        pq, pk, pv, picks = pool_qkv_pl(perturb(q, i), k, v, groups,
                                        return_picks=True)
        out = unpool_pl(pq + pk + pv, q, groups, picks=picks)
        return c + out.astype(jnp.float32).mean()

    timed("pool_unpool_pallas_picks", pool_pallas_picks)

    def pool_pallas_rederive(c, i, q, k, v):
        pq, pk, pv = pool_qkv_pl(perturb(q, i), k, v, groups)
        out = unpool_pl(pq + pk + pv, q, groups)
        return c + out.astype(jnp.float32).mean()

    timed("pool_unpool_pallas_rederive", pool_pallas_rederive)

    def relayout_only(c, i, q, k, v):
        shp, tile = attn.latent_shape, attn.sta_tile
        tq = tile_sequence(perturb(q, i), shp, tile)
        tk = tile_sequence(k, shp, tile)
        tv = tile_sequence(v, shp, tile)
        out = untile_sequence(tq + tk + tv, shp, tile)
        return c + out.astype(jnp.float32).mean()

    timed("tile_untile_qkv", relayout_only)


if __name__ == "__main__":
    main()
