"""Smoke tests: HF-style state dicts apply completely to the native encoders."""

import numpy as np
import pytest
import torch
from flax import nnx

from vorta_tpu.io.torch_import import (
    _apply_tree,
    clip_text_state_dict_to_tree,
    llama_state_dict_to_tree,
    umt5_state_dict_to_tree,
)
from vorta_tpu.models.text_encoders import (
    CLIP_TINY,
    CLIPTextEncoder,
    LLAMA_TINY,
    LlamaTextEncoder,
)
from vorta_tpu.models.umt5 import UMT5_TINY, UMT5Encoder


def r(g, *shape):
    return torch.randn(*shape, generator=g) * 0.05


def test_umt5_import_applies():
    g = torch.Generator().manual_seed(0)
    c = UMT5_TINY
    inner = c.num_heads * c.d_kv
    sd = {"shared.weight": r(g, c.vocab_size, c.d_model),
          "encoder.final_layer_norm.weight": 1 + r(g, c.d_model)}
    for i in range(c.num_layers):
        p = f"encoder.block.{i}"
        sd.update({
            f"{p}.layer.0.layer_norm.weight": 1 + r(g, c.d_model),
            f"{p}.layer.0.SelfAttention.q.weight": r(g, inner, c.d_model),
            f"{p}.layer.0.SelfAttention.k.weight": r(g, inner, c.d_model),
            f"{p}.layer.0.SelfAttention.v.weight": r(g, inner, c.d_model),
            f"{p}.layer.0.SelfAttention.o.weight": r(g, c.d_model, inner),
            f"{p}.layer.0.SelfAttention.relative_attention_bias.weight": r(
                g, c.relative_attention_num_buckets, c.num_heads),
            f"{p}.layer.1.layer_norm.weight": 1 + r(g, c.d_model),
            f"{p}.layer.1.DenseReluDense.wi_0.weight": r(g, c.d_ff, c.d_model),
            f"{p}.layer.1.DenseReluDense.wi_1.weight": r(g, c.d_ff, c.d_model),
            f"{p}.layer.1.DenseReluDense.wo.weight": r(g, c.d_model, c.d_ff),
        })
    model = UMT5Encoder(c, rngs=nnx.Rngs(0))
    tree = umt5_state_dict_to_tree({k: v.numpy() for k, v in sd.items()}, c.num_layers)
    graphdef, state = nnx.split(model)
    applied, missing = _apply_tree(state, tree)
    assert not missing, missing
    nnx.update(model, state)
    # imported embedding matches
    np.testing.assert_allclose(
        np.asarray(model.embed.embedding[...]), sd["shared.weight"].numpy(), rtol=1e-6
    )


def test_llama_import_applies():
    g = torch.Generator().manual_seed(1)
    c = LLAMA_TINY
    hd = c.dim // c.num_heads
    kv = c.num_kv_heads * hd
    sd = {"model.embed_tokens.weight": r(g, c.vocab_size, c.dim),
          "model.norm.weight": 1 + r(g, c.dim)}
    for i in range(c.num_layers):
        p = f"model.layers.{i}"
        sd.update({
            f"{p}.input_layernorm.weight": 1 + r(g, c.dim),
            f"{p}.self_attn.q_proj.weight": r(g, c.dim, c.dim),
            f"{p}.self_attn.k_proj.weight": r(g, kv, c.dim),
            f"{p}.self_attn.v_proj.weight": r(g, kv, c.dim),
            f"{p}.self_attn.o_proj.weight": r(g, c.dim, c.dim),
            f"{p}.post_attention_layernorm.weight": 1 + r(g, c.dim),
            f"{p}.mlp.gate_proj.weight": r(g, c.ffn_dim, c.dim),
            f"{p}.mlp.up_proj.weight": r(g, c.ffn_dim, c.dim),
            f"{p}.mlp.down_proj.weight": r(g, c.dim, c.ffn_dim),
        })
    model = LlamaTextEncoder(c, rngs=nnx.Rngs(0))
    tree = llama_state_dict_to_tree({k: v.numpy() for k, v in sd.items()}, c.num_layers)
    graphdef, state = nnx.split(model)
    applied, missing = _apply_tree(state, tree)
    assert not missing, missing


def test_clip_import_applies():
    g = torch.Generator().manual_seed(2)
    c = CLIP_TINY
    sd = {
        "text_model.embeddings.token_embedding.weight": r(g, c.vocab_size, c.dim),
        "text_model.embeddings.position_embedding.weight": r(g, c.max_len, c.dim),
        "text_model.final_layer_norm.weight": 1 + r(g, c.dim),
        "text_model.final_layer_norm.bias": r(g, c.dim),
    }
    for i in range(c.num_layers):
        p = f"text_model.encoder.layers.{i}"
        for name, shape in [
            ("layer_norm1.weight", (c.dim,)), ("layer_norm1.bias", (c.dim,)),
            ("layer_norm2.weight", (c.dim,)), ("layer_norm2.bias", (c.dim,)),
            ("self_attn.q_proj.weight", (c.dim, c.dim)), ("self_attn.q_proj.bias", (c.dim,)),
            ("self_attn.k_proj.weight", (c.dim, c.dim)), ("self_attn.k_proj.bias", (c.dim,)),
            ("self_attn.v_proj.weight", (c.dim, c.dim)), ("self_attn.v_proj.bias", (c.dim,)),
            ("self_attn.out_proj.weight", (c.dim, c.dim)), ("self_attn.out_proj.bias", (c.dim,)),
            ("mlp.fc1.weight", (c.ffn_dim, c.dim)), ("mlp.fc1.bias", (c.ffn_dim,)),
            ("mlp.fc2.weight", (c.dim, c.ffn_dim)), ("mlp.fc2.bias", (c.dim,)),
        ]:
            sd[f"{p}.{name}"] = r(g, *shape)
    model = CLIPTextEncoder(c, rngs=nnx.Rngs(0))
    tree = clip_text_state_dict_to_tree({k: v.numpy() for k, v in sd.items()}, c.num_layers)
    graphdef, state = nnx.split(model)
    applied, missing = _apply_tree(state, tree)
    assert not missing, missing
