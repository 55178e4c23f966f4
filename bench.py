"""Benchmark: Wan-1.3B DiT denoise-step time, routed sparse vs full attention.

Prints ONE JSON line:
  {"metric": "...", "value": <routed forward ms>, "unit": "ms",
   "vs_baseline": <full_ms / routed_ms speedup>}

Protocol mirrors the reference's baseline-vs-vorta wall-clock comparison
(README.md:36-69): same model, same shapes, full 3D attention vs hard-routed
sparse attention.  Runs on whatever jax.default_backend() provides (the real
TPU chip under the driver); uses scan-inside-jit timing because per-dispatch
tunnel latency would otherwise dominate.

Config: Wan2.1-T2V-1.3B shapes at 480p x 77 frames (latent grid 20x30x52,
31200 tokens), bf16, random weights.  Routing scores come from the (random)
routers at a mid-schedule timestep — representative sparsity, not a trained
router.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from vorta_tpu.config import WAN_1_3B, AttentionConfig


def device_seconds(fn, *args, iters: int = 4) -> float:
    """Median per-iteration device time of fn, amortizing dispatch latency."""

    @jax.jit
    def run(*args):
        def body(c, i):
            out = fn(c, i, *args)
            return out, ()
        c0 = jnp.zeros((), jnp.float32)
        cf, _ = jax.lax.scan(body, c0, jnp.arange(iters))
        return cf

    float(run(*args))  # compile + warm
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / iters


def main():
    interpret = jax.default_backend() != "tpu"
    if interpret:
        print(
            json.dumps({"metric": "skipped", "value": 0, "unit": "ms",
                        "vs_baseline": 0, "note": "no TPU backend"}),
            flush=True,
        )
        return

    from vorta_tpu.models.wan import WanModel

    # Reference flagship geometry: Wan 720p x 77f -> latent grid (20, 45, 80)
    # = 72000 tokens, STA tile [5, 9, 8] (train.sh), lowres window [2, 3, 2].
    # Model: Wan-1.3B shapes (the 14B does not fit a single v5e; heads/head_dim
    # and the attention geometry — where the speedup lives — are identical).
    attn = AttentionConfig(
        latent_shape=(20, 45, 80),
        sta_window=(3, 3, 3),
        sta_tile=(5, 9, 8),
        lowres_window=(2, 3, 2),
        block_q=1024,
        block_kv=1024,
        tau_sparse=0.3,
    )
    model = WanModel(WAN_1_3B, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(model)

    b = 1
    latents = jax.random.normal(
        jax.random.PRNGKey(0), (b, 20, 90, 160, WAN_1_3B.in_channels), jnp.bfloat16
    )
    context = jax.random.normal(
        jax.random.PRNGKey(1), (b, WAN_1_3B.text_len, WAN_1_3B.text_dim), jnp.bfloat16
    )

    def fwd(c, i, state, mode):
        m = nnx.merge(graphdef, state)
        t = jnp.full((b,), 500.0) + i.astype(jnp.float32)  # vary per iter
        out = m(latents, t, context, attn_cfg=attn, routing_mode=mode)
        return c + out.sample.astype(jnp.float32).mean()

    full_s = device_seconds(lambda c, i, s: fwd(c, i, s, "off"), state, iters=2)
    routed_s = device_seconds(lambda c, i, s: fwd(c, i, s, "hard"), state, iters=2)

    result = {
        "metric": "wan1.3b_720p_77f_denoise_fwd_ms_routed",
        "value": round(routed_s * 1e3, 2),
        "unit": "ms",
        "vs_baseline": round(full_s / routed_s, 4),
        "full_ms": round(full_s * 1e3, 2),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
