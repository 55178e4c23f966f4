"""Joint (Hunyuan) attention timings at flagship 720p x 117f geometry.

Latent grid (30, 45, 80) = 108000 video tokens + 256 text, H=24 heads at
D=128 (HunyuanVideo 13B attention shapes).  Compares the joint experts at
the attention level: full vs window-dense STA vs lowres, plus the old tiled
STA path for reference.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vorta_tpu.config import AttentionConfig
from vorta_tpu.ops.joint_experts import (
    JointConfig,
    joint_full_attention,
    joint_lowres_attention,
    joint_sta_attention,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--heads", type=int, default=24)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    vcfg = AttentionConfig(
        latent_shape=(30, 45, 80), sta_window=(3, 3, 3), sta_tile=(6, 9, 8),
        lowres_window=(2, 3, 2), block_q=1024, block_kv=1024,
    )
    jcfg = JointConfig(video=vcfg, text_len=256)
    b, h, d = 1, args.heads, 128
    sv = vcfg.seq_len
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    qv, kv_, vv = (jax.random.normal(k, (b, h, sv, d), jnp.bfloat16) for k in ks[:3])
    qt, kt, vt = (jax.random.normal(k, (b, h, 256, d), jnp.bfloat16) for k in ks[3:])
    mask = jnp.arange(256)[None, :] < 211

    def timed(name, fn):
        @jax.jit
        def run(qv, kv_, vv, qt, kt, vt):
            def body(c, i):
                video, text = fn(
                    (qv * (1 + 0.001 * i)).astype(qv.dtype), kv_, vv, qt, kt, vt
                )
                return c + video.astype(jnp.float32).mean() + text.astype(jnp.float32).mean(), ()
            cf, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                 jnp.arange(args.iters))
            return cf
        float(run(qv, kv_, vv, qt, kt, vt))
        t0 = time.perf_counter()
        float(run(qv, kv_, vv, qt, kt, vt))
        print(f"{name:24s} {(time.perf_counter() - t0) / args.iters * 1e3:9.2f} ms",
              flush=True)

    timed("joint_full", lambda *a: joint_full_attention(*a, mask, jcfg))
    timed("joint_sta_windowdense", lambda *a: joint_sta_attention(*a, mask, jcfg))
    timed("joint_lowres", lambda *a: joint_lowres_attention(*a, mask, jcfg))


if __name__ == "__main__":
    main()
