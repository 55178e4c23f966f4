"""XLA pooling vs fused Pallas pooling at Wan 720p (12 heads)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from vorta_tpu.config import AttentionConfig
from vorta_tpu.ops.experts import lowres_groups_for
from vorta_tpu.ops.coreset import pool_by_similarity, unpool_by_similarity
from vorta_tpu.ops.coreset_pallas import pool_qkv, unpool


def device_seconds(fn, *args, iters=4):
    @jax.jit
    def run(*args):
        def body(c, i):
            return c + fn(i, *args), ()
        cf, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(iters))
        return cf
    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / iters


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="both", choices=["both", "xla", "pallas"])
    args = ap.parse_args()
    attn = AttentionConfig(latent_shape=(20, 45, 80), sta_window=(3, 3, 3),
                           sta_tile=(5, 9, 8), lowres_window=(2, 3, 2),
                           block_q=1024, block_kv=1024)
    groups = lowres_groups_for(attn)
    b, h, d = 1, 12, 128
    s = attn.seq_len
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d), jnp.bfloat16)

    def xla(i, q, k, v):
        qq = q * (1 + 0.001 * i.astype(jnp.bfloat16))
        pq, m = pool_by_similarity(qq, groups)
        pk, _ = pool_by_similarity(k, groups, m)
        pv, _ = pool_by_similarity(v, groups, m)
        return unpool_by_similarity(pq + pk + pv, groups, m).astype(jnp.float32).mean()

    def pallas(i, q, k, v):
        qq = q * (1 + 0.001 * i.astype(jnp.bfloat16))
        pq, pk, pv = pool_qkv(qq, k, v, groups)
        return unpool(pq + pk + pv, qq, groups).astype(jnp.float32).mean()

    for name, fn in (("xla", xla), ("pallas", pallas)):
        if args.which not in ("both", name):
            continue
        sec = device_seconds(fn, q, k, v)
        print(f"{name:8s} {sec*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
