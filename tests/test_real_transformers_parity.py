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


def test_token_refiner_vs_torch_multihead_attention():
    """Full TokenRefiner forward vs an INDEPENDENT torch implementation
    whose attention is torch.nn.MultiheadAttention (upstream-maintained
    packed-QKV MHA, not our layout re-written in torch) — retires the
    round-3 refiner caveat as far as this no-diffusers environment allows
    (models/hunyuan.py NOTE; ref modeling_hunyuan.py:621-645).

    Validated semantics: masked mean-pool of the llama states, cos-first
    sinusoid, silu time/text embedders, pre-norm attention with key padding
    mask, gate chunk order (attn, mlp), tanh-approx gelu FFN."""
    import jax

    from vorta_tpu.models.hunyuan import HunyuanModelConfig, TokenRefiner

    cfg = HunyuanModelConfig(
        dim=64, num_heads=2, head_dim=32, dual_layers=1, single_layers=1,
        text_dim=48, text_len=12, pooled_dim=16, rope_axes=(8, 12, 12),
        freq_dim=32, refiner_layers=2, mlp_ratio=2.0,
    )
    refiner = TokenRefiner(cfg, dtype=jnp.float32, param_dtype=jnp.float32,
                           rngs=nnx.Rngs(0))

    def w(lin):  # flax (in, out) kernel -> torch (out, in) weight
        return torch.from_numpy(np.asarray(lin.kernel[...], np.float32).T)

    def bvec(lin):
        return torch.from_numpy(np.asarray(lin.bias[...], np.float32))

    rng = np.random.default_rng(0)
    b, L = 2, cfg.text_len
    text = rng.standard_normal((b, L, cfg.text_dim)).astype(np.float32)
    t = np.asarray([500.0, 200.0], np.float32)
    mask = np.ones((b, L), bool)
    mask[0, 7:] = False  # padded prompt in row 0

    ours = refiner(jnp.asarray(text), jnp.asarray(t), jnp.asarray(mask))

    with torch.no_grad():
        tt, mm_t = torch.from_numpy(text), torch.from_numpy(mask)
        # sinusoid (diffusers get_timestep_embedding, flip_sin_to_cos)
        half = cfg.freq_dim // 2
        freqs = torch.exp(-np.log(10000.0) * torch.arange(half) / half)
        args = torch.from_numpy(t)[:, None] * freqs[None]
        sinus = torch.cat([args.cos(), args.sin()], dim=-1)
        te = refiner.time_embedder
        t_emb = torch.nn.functional.silu(sinus @ w(te.linear_1).T + bvec(te.linear_1))
        t_emb = t_emb @ w(te.linear_2).T + bvec(te.linear_2)
        mf = mm_t.float()[:, :, None]
        pooled = (tt * mf).sum(1) / mf.sum(1).clamp(min=1.0)
        pe = torch.nn.functional.silu(
            pooled @ w(refiner.text_pool_embedder).T + bvec(refiner.text_pool_embedder))
        pe = pe @ w(refiner.text_pool_out).T + bvec(refiner.text_pool_out)
        c = t_emb + pe
        x = tt @ w(refiner.proj_in).T + bvec(refiner.proj_in)

        for blk in refiner.blocks:
            mha = torch.nn.MultiheadAttention(cfg.dim, cfg.num_heads,
                                              batch_first=True, bias=True)
            mha.in_proj_weight.copy_(torch.cat(
                [w(blk.to_q), w(blk.to_k), w(blk.to_v)], dim=0))
            mha.in_proj_bias.copy_(torch.cat(
                [bvec(blk.to_q), bvec(blk.to_k), bvec(blk.to_v)], dim=0))
            mha.out_proj.weight.copy_(w(blk.to_out))
            mha.out_proj.bias.copy_(bvec(blk.to_out))
            gates = torch.nn.functional.silu(c) @ w(blk.gates.linear).T + \
                bvec(blk.gates.linear)
            g_attn, g_mlp = gates.chunk(2, dim=-1)
            nx = torch.nn.functional.layer_norm(
                x, (cfg.dim,),
                torch.from_numpy(np.asarray(blk.norm1.scale[...], np.float32)),
                torch.from_numpy(np.asarray(blk.norm1.bias[...], np.float32)),
                eps=cfg.eps)
            attn_out, _ = mha(nx, nx, nx, key_padding_mask=~mm_t,
                              need_weights=False)
            x = x + attn_out * g_attn[:, None]
            n2 = torch.nn.functional.layer_norm(
                x, (cfg.dim,),
                torch.from_numpy(np.asarray(blk.norm2.scale[...], np.float32)),
                torch.from_numpy(np.asarray(blk.norm2.bias[...], np.float32)),
                eps=cfg.eps)
            ff = torch.nn.functional.gelu(
                n2 @ w(blk.ff.proj_in).T + bvec(blk.ff.proj_in),
                approximate="tanh")
            ff = ff @ w(blk.ff.proj_out).T + bvec(blk.ff.proj_out)
            x = x + ff * g_mlp[:, None]

    # padded rows may legitimately differ (their queries attend to garbage in
    # one impl vs masked rows elsewhere are still computed); the CONSUMED
    # tokens are the unpadded ones
    got = np.asarray(ours)
    ref = x.numpy()
    np.testing.assert_allclose(got[1], ref[1], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[0, :7], ref[0, :7], rtol=2e-4, atol=2e-4)


def test_hunyuan_checkpoint_key_validation():
    """hunyuan_expected_keys matches the importer's consumed key set exactly
    (the make_state fixture is the single source of truth for the diffusers
    layout in this suite)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_hunyuan_import import CFG, make_state

    from vorta_tpu.io.torch_import import (
        hunyuan_expected_keys,
        validate_hunyuan_checkpoint_keys,
    )

    sd = make_state()
    missing, unexpected = validate_hunyuan_checkpoint_keys(
        sd.keys(), CFG.dual_layers, CFG.single_layers, CFG.refiner_layers)
    assert missing == [] and unexpected == [], (missing, unexpected)

    # a truncated checkpoint is caught
    sd2 = dict(sd)
    sd2.pop("transformer_blocks.0.attn.to_q.weight")
    sd2["bogus.key"] = sd["proj_out.bias"]
    missing, unexpected = validate_hunyuan_checkpoint_keys(
        sd2.keys(), CFG.dual_layers, CFG.single_layers, CFG.refiner_layers)
    assert missing == ["transformer_blocks.0.attn.to_q.weight"]
    assert unexpected == ["bogus.key"]
