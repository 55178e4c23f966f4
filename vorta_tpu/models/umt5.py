"""UMT5 encoder — native NNX implementation for Wan text conditioning.

Wan 2.1 conditions on UMT5-XXL encoder states (the reference gets this from
transformers through the diffusers pipeline).  UMT5 differs from T5 in that
every layer owns its relative-position bias (T5 shares layer 0's).

Encoder-only: token embedding -> N blocks of (RMSNorm -> self-attention with
relative position bias -> residual, RMSNorm -> gated-GELU FFN -> residual)
-> final RMSNorm.  No dropout at inference.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from .common import RMSNorm


@dataclasses.dataclass(frozen=True)
class UMT5Config:
    vocab_size: int = 256384
    d_model: int = 4096
    d_kv: int = 64
    num_heads: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    eps: float = 1e-6


UMT5_XXL = UMT5Config()
UMT5_TINY = UMT5Config(
    vocab_size=512, d_model=64, d_kv=16, num_heads=4, d_ff=128, num_layers=2
)


def relative_position_bucket(
    relative_position: np.ndarray, num_buckets: int = 32, max_distance: int = 128
) -> np.ndarray:
    """Bidirectional T5 bucket scheme (host-side, static per seq length)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int64) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_large = np.minimum(val_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_large)


class UMT5Attention(nnx.Module):
    def __init__(self, cfg: UMT5Config, *, dtype, param_dtype, rngs: nnx.Rngs):
        inner = cfg.num_heads * cfg.d_kv
        kw = dict(dtype=dtype, param_dtype=param_dtype, use_bias=False, rngs=rngs)
        self.cfg = cfg
        self.q = nnx.Linear(cfg.d_model, inner, **kw)
        self.k = nnx.Linear(cfg.d_model, inner, **kw)
        self.v = nnx.Linear(cfg.d_model, inner, **kw)
        self.o = nnx.Linear(inner, cfg.d_model, **kw)
        # per-layer relative position bias (the UMT5 difference)
        self.rel_bias = nnx.Embed(
            cfg.relative_attention_num_buckets, cfg.num_heads,
            dtype=dtype, param_dtype=param_dtype, rngs=rngs,
        )

    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        cfg = self.cfg
        b, s, _ = x.shape
        h, dk = cfg.num_heads, cfg.d_kv

        def heads(t):
            return t.reshape(b, s, h, dk).transpose(0, 2, 1, 3)

        q = heads(self.q(x))
        k = heads(self.k(x))
        v = heads(self.v(x))

        pos = np.arange(s)
        buckets = relative_position_bucket(
            pos[None, :] - pos[:, None],
            cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance,
        )
        bias = self.rel_bias(jnp.asarray(buckets))  # (S, S, H)
        bias = bias.transpose(2, 0, 1)[None].astype(jnp.float32)

        # T5 attention is UNSCALED (scale folded into init)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
        )
        scores = scores + bias
        scores = jnp.where(mask[:, None, None, :], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.float32))
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, s, h * dk)
        return self.o(out)


class UMT5FFN(nnx.Module):
    def __init__(self, cfg: UMT5Config, *, dtype, param_dtype, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, use_bias=False, rngs=rngs)
        self.wi_0 = nnx.Linear(cfg.d_model, cfg.d_ff, **kw)  # gate
        self.wi_1 = nnx.Linear(cfg.d_model, cfg.d_ff, **kw)
        self.wo = nnx.Linear(cfg.d_ff, cfg.d_model, **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.wo(jax.nn.gelu(self.wi_0(x), approximate=True) * self.wi_1(x))


class UMT5Block(nnx.Module):
    def __init__(self, cfg: UMT5Config, *, dtype, param_dtype, rngs: nnx.Rngs):
        self.norm1 = RMSNorm(cfg.d_model, cfg.eps, rngs=rngs)
        self.attn = UMT5Attention(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm2 = RMSNorm(cfg.d_model, cfg.eps, rngs=rngs)
        self.ffn = UMT5FFN(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x, mask):
        x = x + self.attn(self.norm1(x), mask)
        return x + self.ffn(self.norm2(x))


class UMT5Encoder(nnx.Module):
    def __init__(self, cfg: UMT5Config, *, dtype=jnp.float32, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        self.cfg = cfg
        self.embed = nnx.Embed(cfg.vocab_size, cfg.d_model, dtype=dtype,
                               param_dtype=param_dtype, rngs=rngs)
        self.blocks = nnx.List(
            [UMT5Block(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_layers)]
        )
        self.final_norm = RMSNorm(cfg.d_model, cfg.eps, rngs=rngs)

    def __call__(self, input_ids: jax.Array, mask: jax.Array) -> jax.Array:
        """input_ids (B, S) int32, mask (B, S) bool -> (B, S, d_model).

        Outputs at padded positions are zeroed, matching the reference
        pipeline's masked prompt embeddings."""
        x = self.embed(input_ids)
        for block in self.blocks:
            x = block(x, mask)
        x = self.final_norm(x)
        return x * mask[:, :, None].astype(x.dtype)
