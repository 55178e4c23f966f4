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
    ap.add_argument("--stage", default="both",
                    choices=["both", "pool", "copy", "headmap5", "headmap12"])
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

    def copy_probe(i, q, k, v):
        """Same specs/blocks as pool_qkv but a matching-free kernel body:
        isolates DMA + in-VMEM layout cost from the selection compute."""
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from vorta_tpu.ops.coreset_pallas import (_cell_plan, _geom,
                                                  _stack_slots)

        geom = _geom(groups)
        wt, wh, ww = geom.window
        u = groups.num_kept_margins
        g = groups.num_groups
        t2, h3, w2, w2c = _cell_plan(geom, 128, u, 2)
        ns = w2 // w2c
        d = 128

        def kern(*refs):
            it = iter(refs)
            q_refs = [next(it) for _ in range(wh)]
            k_refs = [next(it) for _ in range(wh)]
            v_refs = [next(it) for _ in range(wh)]
            outs = [next(it) for _ in range(6)]
            for xr, (c_ref, m_ref) in zip(
                (q_refs, k_refs, v_refs),
                ((outs[0], outs[1]), (outs[2], outs[3]), (outs[4], outs[5])),
            ):
                x_all = _stack_slots(xr, geom.window, d)
                c_ref[0, 0, 0] = x_all[0].reshape(h3, w2c, d).astype(c_ref.dtype)
                kept = jnp.concatenate([x_all[i1] for i1 in range(u)], axis=-1)
                m_ref[0, 0, 0] = kept.reshape(h3, w2c, u * d).astype(m_ref.dtype)

        def in_map(hi, bb, hh_, i2, *refs):
            return (bb, hh_, i2 // ns, 0, 0, hi, i2 % ns, 0)

        def out_map(bb, hh_, i2, *refs):
            return (bb, hh_, i2 // ns, 0, i2 % ns, 0)

        bq, hq = q.shape[0], q.shape[1]
        qq = q * (1 + 0.001 * i.astype(jnp.bfloat16))
        in_specs, inputs = [], []
        for x in (qq, k, v):
            xv = x.reshape(bq, hq, t2, wt, h3, wh, w2, ww * d)
            for hi in range(wh):
                in_specs.append(pl.BlockSpec(
                    (1, 1, 1, wt, h3, 1, w2c, ww * d),
                    functools.partial(in_map, hi)))
                inputs.append(xv)
        out_shapes, out_specs = [], []
        for _ in range(3):
            out_shapes += [
                jax.ShapeDtypeStruct((bq, hq, t2, h3, w2, d), q.dtype),
                jax.ShapeDtypeStruct((bq, hq, t2, h3, w2, u * d), q.dtype),
            ]
            out_specs += [
                pl.BlockSpec((1, 1, 1, h3, w2c, d), out_map),
                pl.BlockSpec((1, 1, 1, h3, w2c, u * d), out_map),
            ]
        outs = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(bq, hq, t2 * ns),
                in_specs=in_specs, out_specs=out_specs),
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
                vmem_limit_bytes=80 * 2**20),
        )(*inputs)
        return sum(o.astype(jnp.float32).mean() for o in outs)

    def pallas(i, q, k, v):
        if args.stage == "copy":
            return copy_probe(i, q, k, v)
        qq = q * (1 + 0.001 * i.astype(jnp.bfloat16))
        if args.stage.startswith("headmap"):
            n = int(args.stage[len("headmap"):])
            h = q.shape[1]
            hm = jnp.minimum(jnp.arange(h), n - 1).astype(jnp.int32)
            pq, pk, pv = pool_qkv(qq, k, v, groups, head_map=hm,
                                  num_active=jnp.asarray(n, jnp.int32))
            up = unpool(pq + pk + pv, qq, groups, head_map=hm,
                        num_active=jnp.asarray(n, jnp.int32))
            return sum(jnp.where(jnp.arange(h)[None, :, None, None] < n, x, 0)
                       .astype(jnp.float32).mean()
                       for x in (up,))
        pq, pk, pv = pool_qkv(qq, k, v, groups)
        if args.stage == "pool":
            return (pq.astype(jnp.float32).mean()
                    + pk.astype(jnp.float32).mean()
                    + pv.astype(jnp.float32).mean())
        return unpool(pq + pk + pv, qq, groups).astype(jnp.float32).mean()

    for name, fn in (("xla", xla), ("pallas", pallas)):
        if args.which not in ("both", name):
            continue
        sec = device_seconds(fn, q, k, v)
        print(f"{name:8s} {sec*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
