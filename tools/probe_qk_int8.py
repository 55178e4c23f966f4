"""Measure the int8-QK^T (SageAttention-style) win on the real chip.

Times the masked-table flash kernel (ops/flash_manual.py) at Wan 720p
geometry in bf16 vs int8-QK for the two dense visitation patterns the
routed path uses it for — full attention (72000 kv) and the pooled lowres
expert (36000 kv) — plus, when --sta is given, the grid-pipelined STA
kernel (ops/sta_pipe.py).

The question it answers: on v5e the int8 MXU runs 2x bf16, but the dequant
multiply adds one VPU op per score to a fast-softmax path that is already
within ~10%% of its dots floor — does int8 QK^T pay, and by how much?

Usage: python tools/probe_qk_int8.py [--which full|lowres|sta|all]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vorta_tpu.config import AttentionConfig
from vorta_tpu.ops.experts import lowres_groups_for
from vorta_tpu.ops.routed_fused import routed_geometry


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


def quantize_per_head(x):
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(0, 2, 3))  # (H,)
    s = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / s[None, :, None, None]), -127, 127
    ).astype(jnp.int8)
    return xq, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="all")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    attn = AttentionConfig(
        latent_shape=(20, 45, 80), sta_window=(3, 3, 3), sta_tile=(5, 9, 8),
        lowres_window=(2, 3, 2), block_q=1024, block_kv=1024, tau_sparse=0.3,
    )
    b, h, d = 1, 12, 128
    s = attn.seq_len
    pooled = lowres_groups_for(attn).pooled_length
    geo = routed_geometry(attn)
    from vorta_tpu.ops.flash_manual import sparse_flash_attention_manual

    def mk(seq, call):
        q = jax.random.normal(jax.random.PRNGKey(0), (b, h, seq, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (b, h, seq, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (b, h, seq, d), jnp.bfloat16)
        pad = call.q_pad - seq

        def padded(x):
            return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))

        cnt = jnp.broadcast_to(jnp.asarray(call.kv_count), (h,) + call.kv_count.shape[1:])

        def bf16(c, i, q, k, v):
            out = sparse_flash_attention_manual(
                padded(q * (1 + 1e-3 * i.astype(jnp.float32)).astype(q.dtype)),
                padded(k), padded(v),
                jnp.asarray(call.kv_index), cnt,
                block_q=call.block_q, block_kv=call.block_kv,
                kv_valid_len=call.valid_len, softmax="fast",
            )
            return c + out.astype(jnp.float32).mean()

        def int8(c, i, q, k, v):
            qq, sq = quantize_per_head(q * (1 + 1e-3 * i.astype(jnp.float32)).astype(q.dtype))
            kq, sk = quantize_per_head(k)
            out = sparse_flash_attention_manual(
                padded(qq), padded(kq), padded(v),
                jnp.asarray(call.kv_index), cnt,
                block_q=call.block_q, block_kv=call.block_kv,
                kv_valid_len=call.valid_len, softmax="fast",
                qk_scale=sq * sk,
            )
            return c + out.astype(jnp.float32).mean()

        def int8_pre(c, i, q, k, v):
            # quantization cost excluded: measures the kernel alone
            qq, sq = quantize_per_head(q)
            kq, sk = quantize_per_head(k)
            qq = qq + (i % 2).astype(jnp.int8)  # defeat value-cache
            out = sparse_flash_attention_manual(
                padded(qq), padded(kq), padded(v),
                jnp.asarray(call.kv_index), cnt,
                block_q=call.block_q, block_kv=call.block_kv,
                kv_valid_len=call.valid_len, softmax="fast",
                qk_scale=sq * sk,
            )
            return c + out.astype(jnp.float32).mean()

        return (q, k, v), bf16, int8, int8_pre

    cases = []
    if args.which in ("all", "full"):
        cases.append(("full_72000", mk(s, geo.full)))
    if args.which in ("all", "lowres"):
        cases.append(("pooled_36000", mk(pooled, geo.lowres)))
    for name, (tensors, bf16, int8, int8_pre) in cases:
        t_bf = device_seconds(bf16, *tensors, iters=args.iters)
        t_i8 = device_seconds(int8, *tensors, iters=args.iters)
        t_i8k = device_seconds(int8_pre, *tensors, iters=args.iters)
        print(f"{name:16s} bf16 {t_bf*1e3:8.2f} ms | int8(q+quant) "
              f"{t_i8*1e3:8.2f} ms | int8(kernel) {t_i8k*1e3:8.2f} ms | "
              f"kernel speedup {t_bf/t_i8k:.3f}x", flush=True)

    if args.which in ("all", "sta"):
        from vorta_tpu.ops.sta_pipe import sta_pipe_attention

        q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d), jnp.bfloat16)
        act = jnp.ones((h,), jnp.int32)

        def sta_bf16(c, i, q, k, v):
            out = sta_pipe_attention(
                q * (1 + 1e-3 * i.astype(jnp.float32)).astype(q.dtype), k, v,
                act, latent_shape=attn.latent_shape, tile=attn.sta_tile,
                window=attn.sta_window)
            return c + out.astype(jnp.float32).mean()

        t = device_seconds(sta_bf16, q, k, v, iters=args.iters)
        print(f"{'sta_bf16':16s} {t*1e3:8.2f} ms", flush=True)
        try:
            def sta_int8(c, i, q, k, v):
                qq, sq = quantize_per_head(q)
                kq, sk = quantize_per_head(k)
                qq = qq + (i % 2).astype(jnp.int8)
                out = sta_pipe_attention(
                    qq, kq, v, act, latent_shape=attn.latent_shape,
                    tile=attn.sta_tile, window=attn.sta_window,
                    qk_scale=sq * sk)
                return c + out.astype(jnp.float32).mean()

            t8 = device_seconds(sta_int8, q, k, v, iters=args.iters)
            print(f"{'sta_int8(kern)':16s} {t8*1e3:8.2f} ms | speedup {t/t8:.3f}x",
                  flush=True)
        except TypeError:
            print("sta_pipe has no qk_scale yet — skipped", flush=True)


if __name__ == "__main__":
    main()
