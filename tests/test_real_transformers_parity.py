"""Parity against the REAL HuggingFace transformers modules.

Every other parity test in this suite compares against hand-written torch
oracles, which share any misreading of the architecture.  transformers IS
available in this environment (diffusers is not — see STATUS.md), so the
three text encoders are pinned here against the actual upstream classes at
tiny configs: random-init the HF module, export its state_dict through our
importers, and require matching hidden states.

Reference consumers: UMT5-XXL (Wan, pipeline_wan.py:267-276), Llama +
CLIP-L (Hunyuan text stack).
"""

import numpy as np
import pytest
import torch
from flax import nnx

torch.manual_seed(0)

import jax.numpy as jnp

from vorta_tpu.io.torch_import import (
    _apply_tree,
    clip_text_state_dict_to_tree,
    llama_state_dict_to_tree,
    umt5_state_dict_to_tree,
)
from vorta_tpu.models.text_encoders import (
    CLIPTextConfig as OurCLIPConfig,
    CLIPTextEncoder,
    LlamaConfig as OurLlamaConfig,
    LlamaTextEncoder,
)
from vorta_tpu.models.umt5 import UMT5Config as OurUMT5Config, UMT5Encoder


def _sd_numpy(module):
    return {k: v.detach().float().numpy() for k, v in module.state_dict().items()}


def test_umt5_matches_transformers():
    from transformers import UMT5Config, UMT5EncoderModel

    hf_cfg = UMT5Config(
        vocab_size=512, d_model=64, d_kv=16, num_heads=4, d_ff=128,
        num_layers=2, dropout_rate=0.0, feed_forward_proj="gated-gelu",
        is_encoder_decoder=False, use_cache=False,
    )
    hf = UMT5EncoderModel(hf_cfg).eval()

    ids = torch.randint(0, 512, (2, 12))
    mask = torch.ones(2, 12, dtype=torch.long)
    mask[1, 9:] = 0
    with torch.no_grad():
        ref = hf(input_ids=ids, attention_mask=mask).last_hidden_state.numpy()

    ours_cfg = OurUMT5Config(
        vocab_size=512, d_model=64, d_kv=16, num_heads=4, d_ff=128, num_layers=2,
    )
    ours = UMT5Encoder(ours_cfg, rngs=nnx.Rngs(0))
    tree = umt5_state_dict_to_tree(_sd_numpy(hf), ours_cfg.num_layers)
    graphdef, state = nnx.split(ours)
    applied, missing = _apply_tree(state, tree)
    assert not missing, missing
    nnx.update(ours, state)

    out = np.asarray(ours(jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy(), bool)))
    m = mask.numpy().astype(bool)
    np.testing.assert_allclose(out[m], ref[m], rtol=2e-4, atol=2e-4)


def test_llama_matches_transformers():
    from transformers import LlamaConfig, LlamaModel

    hf_cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, use_cache=False, attention_bias=False,
        mlp_bias=False, rms_norm_eps=1e-5,
    )
    hf = LlamaModel(hf_cfg).eval()

    ids = torch.randint(0, 256, (2, 10))
    mask = torch.ones(2, 10, dtype=torch.long)
    mask[1, 7:] = 0
    with torch.no_grad():
        ref = hf(input_ids=ids, attention_mask=mask).last_hidden_state.numpy()

    ours_cfg = OurLlamaConfig(
        vocab_size=256, dim=64, num_layers=2, num_heads=4, num_kv_heads=2,
        ffn_dim=128, rope_theta=10000.0,
    )
    ours = LlamaTextEncoder(ours_cfg, rngs=nnx.Rngs(0))
    tree = llama_state_dict_to_tree(_sd_numpy(hf), ours_cfg.num_layers)
    graphdef, state = nnx.split(ours)
    applied, missing = _apply_tree(state, tree)
    assert not missing, missing
    nnx.update(ours, state)

    out = np.asarray(ours(jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy(), bool)))
    m = mask.numpy().astype(bool)
    np.testing.assert_allclose(out[m], ref[m], rtol=2e-4, atol=2e-4)


def test_clip_matches_transformers():
    from transformers import CLIPTextConfig, CLIPTextModel

    eos = 3
    hf_cfg = CLIPTextConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=16, hidden_act="quick_gelu",
        eos_token_id=eos, bos_token_id=2, pad_token_id=1,
    )
    hf = CLIPTextModel(hf_cfg).eval()

    ids = torch.randint(4, 128, (2, 12))
    ids[0, 8] = eos
    ids[1, 11] = eos
    with torch.no_grad():
        ref = hf(input_ids=ids).pooler_output.numpy()

    ours_cfg = OurCLIPConfig(vocab_size=128, dim=32, num_layers=2,
                             num_heads=2, ffn_dim=64, max_len=16)
    ours = CLIPTextEncoder(ours_cfg, rngs=nnx.Rngs(0))
    tree = clip_text_state_dict_to_tree(_sd_numpy(hf), ours_cfg.num_layers)
    graphdef, state = nnx.split(ours)
    applied, missing = _apply_tree(state, tree)
    assert not missing, missing
    nnx.update(ours, state)

    out = np.asarray(ours(jnp.asarray(ids.numpy()), eos_token_id=eos))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
