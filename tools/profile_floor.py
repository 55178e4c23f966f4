"""Non-attention floor decomposition at Wan-1.3B 720p geometry.

The routed e2e block time is ~attention + ~57 ms of non-attention work
(projections, FFN, norms, AdaLN, cross-attn, residuals).  This times each
piece in isolation (scan-inside-jit, perturbed inputs) to find where the
floor actually goes, plus one real WanBlock forward for the total.

Usage: python tools/profile_floor.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from vorta_tpu.config import WAN_1_3B, AttentionConfig


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
    cfg = WAN_1_3B
    attn = AttentionConfig(
        latent_shape=(20, 45, 80), sta_window=(3, 3, 3), sta_tile=(5, 9, 8),
        lowres_window=(2, 3, 2), block_q=1024, block_kv=1024, tau_sparse=0.3,
    )
    b, s, d = 1, attn.seq_len, cfg.dim
    x = jax.random.normal(jax.random.PRNGKey(0), (b, s, d), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (b, cfg.text_len, d), jnp.bfloat16)
    w1 = jax.random.normal(jax.random.PRNGKey(2), (d, cfg.ffn_dim), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(jax.random.PRNGKey(3), (cfg.ffn_dim, d), jnp.bfloat16) * 0.02
    wq = jax.random.normal(jax.random.PRNGKey(4), (d, d), jnp.bfloat16) * 0.02
    temb6 = jax.random.normal(jax.random.PRNGKey(5), (b, 6, d), jnp.float32)

    def perturb(t, i):
        return t * (1 + 0.001 * i.astype(t.dtype))

    def timed(name, fn, *args):
        sec = device_seconds(fn, *args)
        print(f"{name:24s} {sec * 1e3:8.2f} ms", flush=True)
        return sec

    # harness floor: perturb + upcast-mean alone (subtract from the rest)
    timed("harness_baseline", lambda c, i, x: c + perturb(x, i)
          .astype(jnp.float32).mean(), x)

    timed("ffn", lambda c, i, x: c + (
        jax.nn.gelu(perturb(x, i) @ w1, approximate=True) @ w2
    ).astype(jnp.float32).mean(), x)

    def qkv_out(c, i, x):
        h = perturb(x, i)
        q = h @ wq
        k = h @ wq
        v = h @ wq
        return c + ((q + k + v) @ wq).astype(jnp.float32).mean()

    timed("qkv_plus_out_proj", qkv_out, x)

    def norms_adaln(c, i, x):
        h = perturb(x, i).astype(jnp.float32)
        mu = h.mean(-1, keepdims=True)
        var = h.var(-1, keepdims=True)
        n = (h - mu) * jax.lax.rsqrt(var + 1e-6)
        mod = n * (1 + temb6[:, 1, None]) + temb6[:, 0, None]
        return c + mod.astype(jnp.bfloat16).astype(jnp.float32).mean()

    timed("one_fp32_layernorm_mod", norms_adaln, x)

    def residual(c, i, x):
        return c + (perturb(x, i) + x).astype(jnp.float32).mean()

    timed("one_residual_add", residual, x)

    # qk prologue in isolation: rms-norm(full dim) -> head split -> rope,
    # for q and k, plus the v split (self-attention input prep net of the
    # projections).  "_half" is the live contiguous-half convention;
    # "_interleaved" the pre-permutation stride-2 one it replaced.
    from vorta_tpu.ops.rope import apply_rope, apply_rope_half, rope_cos_sin as _rcs

    cos_np, sin_np = _rcs(attn.latent_shape, cfg.head_dim, cfg.rope_theta)
    cos_, sin_ = jnp.asarray(cos_np), jnp.asarray(sin_np)
    nheads = cfg.num_heads
    gamma = jnp.ones((d,), jnp.float32)

    def mk_qk_prep(rope_fn):
        def f(c, i, x):
            h = perturb(x, i)
            outs = []
            for t in (h, h * 1.0001):  # q and k
                tf = t.astype(jnp.float32)
                n = (tf * jax.lax.rsqrt(
                    jnp.mean(jnp.square(tf), -1, keepdims=True) + 1e-6
                ) * gamma).astype(t.dtype)
                s4 = n.reshape(b, -1, nheads, cfg.head_dim).transpose(0, 2, 1, 3)
                outs.append(rope_fn(s4, cos_, sin_))
            vsplit = h.reshape(b, -1, nheads, cfg.head_dim).transpose(0, 2, 1, 3)
            return c + (outs[0] + outs[1] + vsplit).astype(jnp.float32).mean()
        return f

    timed("qk_prep_half", mk_qk_prep(apply_rope_half), x)
    timed("qk_prep_interleaved", mk_qk_prep(apply_rope), x)

    # the head merge on the way out
    x4 = jax.random.normal(jax.random.PRNGKey(7), (b, nheads, s, cfg.head_dim),
                           jnp.bfloat16)

    def merge_only(c, i, x4):
        m = perturb(x4, i).transpose(0, 2, 1, 3).reshape(b, -1, d)
        return c + m.astype(jnp.float32).mean()

    timed("merge_heads", merge_only, x4)

    # real block (hard routing, trained-mix head split emulated 5L/7S)
    from vorta_tpu.models.wan import WanBlock
    from vorta_tpu.ops.rope import rope_cos_sin

    block = WanBlock(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                     rngs=nnx.Rngs(0))
    # trained-mix emulation via router bias: heads 0-4 lowres, 5-11 STA
    bias = np.zeros(cfg.num_heads * 3, np.float32)
    for h in range(cfg.num_heads):
        bias[h * 3 + (1 if h < 5 else 2)] = 8.0
    block.router.linear.bias[...] = jnp.asarray(bias)
    cos, sin = rope_cos_sin(attn.latent_shape, cfg.head_dim, cfg.rope_theta)
    rope = (jnp.asarray(cos), jnp.asarray(sin))
    temb = jax.random.normal(jax.random.PRNGKey(6), (b, d), jnp.float32)

    graphdef, bstate = nnx.split(block)

    def block_fwd(c, i, bstate, x, ctx):
        blk = nnx.merge(graphdef, bstate)
        out, _ = blk(perturb(x, i), ctx, temb6, temb, rope, attn, "hard")
        return c + out.astype(jnp.float32).mean()

    timed("block_hard_5L7S", block_fwd, bstate, x, ctx)

    def block_off(c, i, bstate, x, ctx):
        blk = nnx.merge(graphdef, bstate)
        out, _ = blk(perturb(x, i), ctx, temb6, temb, rope, attn, "off")
        return c + out.astype(jnp.float32).mean()

    timed("block_full_attn", block_off, bstate, x, ctx)

    # true non-attention floor: self-attention replaced by identity
    class _NoAttn(nnx.Module):
        def __call__(self, h, rope, attn_cfg, scores, routing_mode,
                     interpret=False, sp_axis=None):
            return h

    block.attn1 = _NoAttn()
    graphdef2, bstate2 = nnx.split(block)

    def block_noattn(c, i, bstate, x, ctx):
        blk = nnx.merge(graphdef2, bstate)
        out, _ = blk(perturb(x, i), ctx, temb6, temb, rope, attn, "hard")
        return c + out.astype(jnp.float32).mean()

    timed("block_no_selfattn", block_noattn, bstate2, x, ctx)


if __name__ == "__main__":
    main()
