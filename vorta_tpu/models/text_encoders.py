"""Text encoders for HunyuanVideo conditioning: Llama and CLIP.

HunyuanVideo conditions on (a) the last-layer hidden states of a Llama-3-8B
style decoder run over a templated prompt (crop_start strips the template
prefix) and (b) the CLIP-L pooled text embedding (reference drives both via
transformers; SURVEY layer map "External").  These are native NNX
implementations operating on token ids; tokenizers are host-side and
checkpoint-dependent.

Weight-import mappings mirror the HF state dicts (LlamaModel / CLIPTextModel)
in io/torch_import once checkpoints are available.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from .common import RMSNorm


# ---------------------------------------------------------------------------
# Llama (decoder-only, used as a text feature extractor)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128320
    dim: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    ffn_dim: int = 14336
    rope_theta: float = 500000.0
    eps: float = 1e-5


LLAMA_8B = LlamaConfig()
LLAMA_TINY = LlamaConfig(
    vocab_size=256, dim=64, num_layers=2, num_heads=4, num_kv_heads=2,
    ffn_dim=128, rope_theta=10000.0,
)


def _llama_rope(seq_len: int, head_dim: int, theta: float):
    k = np.arange(head_dim // 2, dtype=np.float64)
    inv = theta ** (-2 * k / head_dim)
    ang = np.outer(np.arange(seq_len, dtype=np.float64), inv)
    return jnp.asarray(np.cos(ang), jnp.float32), jnp.asarray(np.sin(ang), jnp.float32)


def _rotate_half_apply(x, cos, sin):
    """HF Llama convention: rotate_half on split halves (not interleaved)."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    cos_f = jnp.concatenate([cos, cos], axis=-1)
    sin_f = jnp.concatenate([sin, sin], axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos_f + rotated.astype(jnp.float32) * sin_f).astype(x.dtype)


class LlamaBlock(nnx.Module):
    def __init__(self, cfg: LlamaConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        hd = d // cfg.num_heads
        kv_dim = cfg.num_kv_heads * hd
        kw = dict(dtype=dtype, param_dtype=param_dtype, use_bias=False, rngs=rngs)
        self.cfg = cfg
        self.input_layernorm = RMSNorm(d, cfg.eps, rngs=rngs)
        self.q_proj = nnx.Linear(d, d, **kw)
        self.k_proj = nnx.Linear(d, kv_dim, **kw)
        self.v_proj = nnx.Linear(d, kv_dim, **kw)
        self.o_proj = nnx.Linear(d, d, **kw)
        self.post_attention_layernorm = RMSNorm(d, cfg.eps, rngs=rngs)
        self.gate_proj = nnx.Linear(d, cfg.ffn_dim, **kw)
        self.up_proj = nnx.Linear(d, cfg.ffn_dim, **kw)
        self.down_proj = nnx.Linear(cfg.ffn_dim, d, **kw)

    def __call__(self, x, mask, rope):
        cfg = self.cfg
        b, s, d = x.shape
        hd = d // cfg.num_heads
        h = self.input_layernorm(x)
        q = self.q_proj(h).reshape(b, s, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        k = self.k_proj(h).reshape(b, s, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
        v = self.v_proj(h).reshape(b, s, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
        cos, sin = rope
        q = _rotate_half_apply(q, cos, sin)
        k = _rotate_half_apply(k, cos, sin)
        rep = cfg.num_heads // cfg.num_kv_heads
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
        scores = scores * (hd**-0.5)
        causal = jnp.tril(jnp.ones((s, s), bool))
        full_mask = causal[None, None] & mask[:, None, None, :]
        scores = jnp.where(full_mask, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.float32)).astype(x.dtype)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, d)
        x = x + self.o_proj(attn)
        h = self.post_attention_layernorm(x)
        x = x + self.down_proj(jax.nn.silu(self.gate_proj(h)) * self.up_proj(h))
        return x


class LlamaTextEncoder(nnx.Module):
    """Decoder-only Llama returning last-layer hidden states (normed)."""

    def __init__(self, cfg: LlamaConfig, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.cfg = cfg
        self.embed_tokens = nnx.Embed(cfg.vocab_size, cfg.dim, dtype=dtype,
                                      param_dtype=param_dtype, rngs=rngs)
        self.layers = nnx.List(
            [LlamaBlock(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
             for _ in range(cfg.num_layers)]
        )
        self.norm = RMSNorm(cfg.dim, cfg.eps, rngs=rngs)

    def __call__(self, input_ids: jax.Array, mask: jax.Array,
                 crop_start: int = 0) -> jax.Array:
        """(B, S) ids + (B, S) mask -> (B, S - crop_start, dim) hidden states.

        crop_start strips the prompt-template prefix the way Hunyuan's
        pipeline does before feeding the token refiner."""
        s = input_ids.shape[1]
        rope = _llama_rope(s, self.cfg.dim // self.cfg.num_heads, self.cfg.rope_theta)
        x = self.embed_tokens(input_ids)
        for layer in self.layers:
            x = layer(x, mask, rope)
        x = self.norm(x)
        return x[:, crop_start:]


# ---------------------------------------------------------------------------
# CLIP text encoder (pooled embedding)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    max_len: int = 77
    eps: float = 1e-5


CLIP_L = CLIPTextConfig()
CLIP_TINY = CLIPTextConfig(vocab_size=128, dim=32, num_layers=2, num_heads=2,
                           ffn_dim=64, max_len=16)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPBlock(nnx.Module):
    def __init__(self, cfg: CLIPTextConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        d = cfg.dim
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.cfg = cfg
        self.layer_norm1 = nnx.LayerNorm(d, epsilon=cfg.eps, rngs=rngs)
        self.q_proj = nnx.Linear(d, d, **kw)
        self.k_proj = nnx.Linear(d, d, **kw)
        self.v_proj = nnx.Linear(d, d, **kw)
        self.out_proj = nnx.Linear(d, d, **kw)
        self.layer_norm2 = nnx.LayerNorm(d, epsilon=cfg.eps, rngs=rngs)
        self.fc1 = nnx.Linear(d, cfg.ffn_dim, **kw)
        self.fc2 = nnx.Linear(cfg.ffn_dim, d, **kw)

    def __call__(self, x, causal_mask):
        cfg = self.cfg
        b, s, d = x.shape
        hd = d // cfg.num_heads
        h = self.layer_norm1(x)
        q = self.q_proj(h).reshape(b, s, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        k = self.k_proj(h).reshape(b, s, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        v = self.v_proj(h).reshape(b, s, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd**-0.5)
        scores = jnp.where(causal_mask, scores.astype(jnp.float32), -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, d)
        x = x + self.out_proj(attn)
        x = x + self.fc2(_quick_gelu(self.fc1(self.layer_norm2(x))))
        return x


class CLIPTextEncoder(nnx.Module):
    def __init__(self, cfg: CLIPTextConfig, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.cfg = cfg
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.token_embedding = nnx.Embed(cfg.vocab_size, cfg.dim, dtype=dtype,
                                         param_dtype=param_dtype, rngs=rngs)
        self.position_embedding = nnx.Param(
            jax.random.normal(rngs.params(), (cfg.max_len, cfg.dim)) * 0.01
        )
        self.blocks = nnx.List(
            [CLIPBlock(cfg, **kw) for _ in range(cfg.num_layers)]
        )
        self.final_layer_norm = nnx.LayerNorm(cfg.dim, epsilon=cfg.eps, rngs=rngs)

    def __call__(self, input_ids: jax.Array, eos_token_id: int = 49407):
        """(B, S) -> pooled (B, dim): hidden state at the first EOS token
        (CLIP pooled_output convention)."""
        b, s = input_ids.shape
        x = self.token_embedding(input_ids) + self.position_embedding[None, :s]
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        for block in self.blocks:
            x = block(x, causal)
        x = self.final_layer_norm(x)
        is_eos = input_ids == eos_token_id
        # index of first EOS (or last token if none)
        idx = jnp.where(jnp.any(is_eos, axis=1), jnp.argmax(is_eos, axis=1), s - 1)
        return x[jnp.arange(b), idx]
