import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from flax import nnx

from vorta_tpu.models.text_encoders import (
    CLIP_TINY,
    CLIPTextEncoder,
    LLAMA_TINY,
    LlamaBlock,
    LlamaTextEncoder,
    _llama_rope,
)


def test_llama_encoder_shapes_and_crop():
    enc = LlamaTextEncoder(LLAMA_TINY, rngs=nnx.Rngs(0))
    ids = jnp.asarray([[1, 5, 9, 2, 7, 3, 0, 0]])
    mask = jnp.asarray([[1, 1, 1, 1, 1, 1, 0, 0]], bool)
    out = enc(ids, mask, crop_start=2)
    assert out.shape == (1, 6, LLAMA_TINY.dim)
    assert np.isfinite(np.asarray(out)).all()


def test_llama_causality():
    # changing a LATER token must not affect earlier hidden states
    enc = LlamaTextEncoder(LLAMA_TINY, rngs=nnx.Rngs(0))
    mask = jnp.ones((1, 8), bool)
    ids1 = jnp.asarray([[1, 5, 9, 2, 7, 3, 4, 6]])
    ids2 = ids1.at[0, 6].set(11)
    o1 = enc(ids1, mask)
    o2 = enc(ids2, mask)
    np.testing.assert_allclose(np.asarray(o1[:, :6]), np.asarray(o2[:, :6]), rtol=1e-5)
    assert np.abs(np.asarray(o1[:, 6:]) - np.asarray(o2[:, 6:])).max() > 1e-5


def test_llama_block_matches_torch_oracle():
    """Pin the HF Llama conventions: rotate_half rope, GQA repeat, SwiGLU."""
    cfg = LLAMA_TINY
    block = LlamaBlock(cfg, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    g = torch.Generator().manual_seed(0)

    def tload(lin):
        w = torch.randn(lin.kernel[...].shape[::-1][0], lin.kernel[...].shape[0], generator=g) * 0.05
        lin.kernel[...] = jnp.asarray(w.numpy().T)
        return w

    wq = tload(block.q_proj); wk = tload(block.k_proj); wv = tload(block.v_proj)
    wo = tload(block.o_proj); wg = tload(block.gate_proj)
    wu = tload(block.up_proj); wd = tload(block.down_proj)

    s, d = 8, cfg.dim
    hd = d // cfg.num_heads
    x = torch.randn(1, s, d, generator=g)
    mask = jnp.ones((1, s), bool)
    rope = _llama_rope(s, hd, cfg.rope_theta)
    out = block(jnp.asarray(x.numpy()), mask, rope)

    with torch.no_grad():
        def rms(v):
            return v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + cfg.eps)

        h = rms(x)
        q = F.linear(h, wq).view(1, s, cfg.num_heads, hd).transpose(1, 2)
        k = F.linear(h, wk).view(1, s, cfg.num_kv_heads, hd).transpose(1, 2)
        v = F.linear(h, wv).view(1, s, cfg.num_kv_heads, hd).transpose(1, 2)
        cos = torch.from_numpy(np.asarray(rope[0])).float()
        sin = torch.from_numpy(np.asarray(rope[1])).float()
        cos_f = torch.cat([cos, cos], dim=-1)
        sin_f = torch.cat([sin, sin], dim=-1)

        def rot(t):
            t1, t2 = t[..., : hd // 2], t[..., hd // 2 :]
            return t * cos_f + torch.cat([-t2, t1], dim=-1) * sin_f

        q, k = rot(q), rot(k)
        rep = cfg.num_heads // cfg.num_kv_heads
        k = k.repeat_interleave(rep, dim=1)
        v = v.repeat_interleave(rep, dim=1)
        attn = F.scaled_dot_product_attention(q, k, v, is_causal=True)
        attn = attn.transpose(1, 2).reshape(1, s, d)
        x1 = x + F.linear(attn, wo)
        h = rms(x1)
        ref = x1 + F.linear(F.silu(F.linear(h, wg)) * F.linear(h, wu), wd)

    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=3e-4, atol=3e-4)


def test_clip_pooled_output():
    enc = CLIPTextEncoder(CLIP_TINY, rngs=nnx.Rngs(0))
    eos = 99
    ids = jnp.asarray([[5, 7, 9, eos, 0, 0], [3, eos, 0, 0, 0, 0]])
    pooled = enc(ids, eos_token_id=eos)
    assert pooled.shape == (2, CLIP_TINY.dim)
    assert np.isfinite(np.asarray(pooled)).all()
    # pooling picks the FIRST eos position: tokens after it must not matter
    ids2 = ids.at[0, 4].set(42)
    pooled2 = enc(ids2, eos_token_id=eos)
    np.testing.assert_allclose(np.asarray(pooled[0]), np.asarray(pooled2[0]), rtol=1e-5)
