"""VAE weight importers vs hand-built synthetic state dicts.

Builds torch-style state dicts in the documented diffusers schema with
config-derived shapes (independently of the importer's walking logic), then
checks that every tensor lands, the conv/linear transposes are right (marker
values), and the decode output actually changes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vorta_tpu.io.torch_import import (
    load_hunyuan_vae_torch_weights,
    load_wan_vae_torch_weights,
)
from vorta_tpu.models.hunyuan_vae import HUNYUAN_VAE_TINY, HunyuanVAE
from vorta_tpu.models.wan_vae import WAN_VAE_TINY, WanVAE


def _conv3(rng, out_ch, in_ch, k=(3, 3, 3)):
    return rng.standard_normal((out_ch, in_ch, *k)).astype(np.float32) * 0.05


def _wan_res(rng, sd, p, cin, cout):
    sd[f"{p}.norm1.gamma"] = np.ones((cin, 1, 1, 1), np.float32)
    sd[f"{p}.conv1.weight"] = _conv3(rng, cout, cin)
    sd[f"{p}.conv1.bias"] = np.zeros(cout, np.float32)
    sd[f"{p}.norm2.gamma"] = np.ones((cout, 1, 1, 1), np.float32)
    sd[f"{p}.conv2.weight"] = _conv3(rng, cout, cout)
    sd[f"{p}.conv2.bias"] = np.zeros(cout, np.float32)
    if cin != cout:
        sd[f"{p}.conv_shortcut.weight"] = _conv3(rng, cout, cin, (1, 1, 1))
        sd[f"{p}.conv_shortcut.bias"] = np.zeros(cout, np.float32)


def _wan_attn(rng, sd, p, c):
    sd[f"{p}.norm.gamma"] = np.ones((c, 1, 1, 1), np.float32)
    sd[f"{p}.to_qkv.weight"] = rng.standard_normal((3 * c, c, 1, 1)).astype(np.float32) * 0.05
    sd[f"{p}.to_qkv.bias"] = np.zeros(3 * c, np.float32)
    sd[f"{p}.proj.weight"] = rng.standard_normal((c, c, 1, 1)).astype(np.float32) * 0.05
    sd[f"{p}.proj.bias"] = np.zeros(c, np.float32)


def build_wan_vae_sd(cfg):
    rng = np.random.default_rng(0)
    dims = [cfg.base_dim * m for m in cfg.dim_mult]
    z = cfg.z_dim
    sd = {}
    # decoder
    top = dims[-1]
    sd["decoder.conv_in.weight"] = _conv3(rng, top, z)
    sd["decoder.conv_in.bias"] = np.zeros(top, np.float32)
    _wan_res(rng, sd, "decoder.mid_block.resnets.0", top, top)
    _wan_attn(rng, sd, "decoder.mid_block.attentions.0", top)
    _wan_res(rng, sd, "decoder.mid_block.resnets.1", top, top)
    k = 0
    rev_dims = list(reversed(dims))
    rev_tdown = list(reversed(cfg.temporal_downsample))
    cin = top
    for i, cout in enumerate(rev_dims):
        for j in range(cfg.num_res_blocks + 1):
            _wan_res(rng, sd, f"decoder.up_blocks.{k}", cin if j == 0 else cout, cout)
            k += 1
        t_up = rev_tdown[i] if i < len(rev_tdown) else False
        last = i == len(rev_dims) - 1
        if t_up:
            sd[f"decoder.up_blocks.{k}.time_conv.weight"] = _conv3(
                rng, 2 * cout, cout, (3, 1, 1))
            sd[f"decoder.up_blocks.{k}.time_conv.bias"] = np.zeros(2 * cout, np.float32)
        if not last:
            sd[f"decoder.up_blocks.{k}.resample.1.weight"] = rng.standard_normal(
                (cout, cout, 3, 3)).astype(np.float32) * 0.05
            sd[f"decoder.up_blocks.{k}.resample.1.bias"] = np.zeros(cout, np.float32)
            k += 1
        elif t_up:
            k += 1
        cin = cout
    sd["decoder.norm_out.gamma"] = np.ones((dims[0], 1, 1, 1), np.float32)
    sd["decoder.conv_out.weight"] = _conv3(rng, 3, dims[0])
    sd["decoder.conv_out.bias"] = np.zeros(3, np.float32)
    # encoder
    sd["encoder.conv_in.weight"] = _conv3(rng, dims[0], 3)
    sd["encoder.conv_in.bias"] = np.zeros(dims[0], np.float32)
    k = 0
    cin = dims[0]
    for i, cout in enumerate(dims):
        for j in range(cfg.num_res_blocks):
            _wan_res(rng, sd, f"encoder.down_blocks.{k}", cin if j == 0 else cout, cout)
            k += 1
        last = i == len(dims) - 1
        if not last:
            sd[f"encoder.down_blocks.{k}.resample.1.weight"] = rng.standard_normal(
                (cout, cout, 3, 3)).astype(np.float32) * 0.05
            sd[f"encoder.down_blocks.{k}.resample.1.bias"] = np.zeros(cout, np.float32)
            if cfg.temporal_downsample[i]:
                sd[f"encoder.down_blocks.{k}.time_conv.weight"] = _conv3(
                    rng, cout, cout, (3, 1, 1))
                sd[f"encoder.down_blocks.{k}.time_conv.bias"] = np.zeros(cout, np.float32)
            k += 1
        cin = cout
    _wan_res(rng, sd, "encoder.mid_block.resnets.0", dims[-1], dims[-1])
    _wan_attn(rng, sd, "encoder.mid_block.attentions.0", dims[-1])
    _wan_res(rng, sd, "encoder.mid_block.resnets.1", dims[-1], dims[-1])
    sd["encoder.norm_out.gamma"] = np.ones((dims[-1], 1, 1, 1), np.float32)
    sd["encoder.conv_out.weight"] = _conv3(rng, 2 * z, dims[-1])
    sd["encoder.conv_out.bias"] = np.zeros(2 * z, np.float32)
    return sd


def test_wan_vae_import(tmp_path):
    import torch

    cfg = WAN_VAE_TINY
    sd = build_wan_vae_sd(cfg)
    path = tmp_path / "vae.pt"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)

    vae = WanVAE(cfg, rngs=nnx.Rngs(0))
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 4, 4, cfg.z_dim))
    before = np.asarray(vae.decode(z, denormalize=False))
    applied, missing = load_wan_vae_torch_weights(vae, path)
    assert not missing
    assert len(applied) > 40
    after = np.asarray(vae.decode(z, denormalize=False))
    assert not np.allclose(before, after)
    # conv transpose convention: kernel (kt,kh,kw,in,out) from (out,in,kt,kh,kw)
    w = np.asarray(vae.decoder.conv_in.conv.kernel[...])
    np.testing.assert_allclose(
        w, sd["decoder.conv_in.weight"].transpose(2, 3, 4, 1, 0), rtol=1e-6
    )
    # encode path also imported
    mean, logvar = vae.encode(jax.random.normal(jax.random.PRNGKey(1), (1, 5, 16, 16, 3)))
    assert np.isfinite(np.asarray(mean)).all()


def _hy_res(rng, sd, p, cin, cout):
    sd[f"{p}.norm1.weight"] = np.ones(cin, np.float32)
    sd[f"{p}.norm1.bias"] = np.zeros(cin, np.float32)
    sd[f"{p}.conv1.weight"] = _conv3(rng, cout, cin)
    sd[f"{p}.conv1.bias"] = np.zeros(cout, np.float32)
    sd[f"{p}.norm2.weight"] = np.ones(cout, np.float32)
    sd[f"{p}.norm2.bias"] = np.zeros(cout, np.float32)
    sd[f"{p}.conv2.weight"] = _conv3(rng, cout, cout)
    sd[f"{p}.conv2.bias"] = np.zeros(cout, np.float32)
    if cin != cout:
        sd[f"{p}.conv_shortcut.weight"] = _conv3(rng, cout, cin, (1, 1, 1))
        sd[f"{p}.conv_shortcut.bias"] = np.zeros(cout, np.float32)


def _hy_attn(rng, sd, p, c):
    sd[f"{p}.group_norm.weight"] = np.ones(c, np.float32)
    sd[f"{p}.group_norm.bias"] = np.zeros(c, np.float32)
    for n in ("q", "k", "v"):
        sd[f"{p}.to_{n}.weight"] = rng.standard_normal((c, c)).astype(np.float32) * 0.05
        sd[f"{p}.to_{n}.bias"] = np.zeros(c, np.float32)
    sd[f"{p}.to_out.0.weight"] = rng.standard_normal((c, c)).astype(np.float32) * 0.05
    sd[f"{p}.to_out.0.bias"] = np.zeros(c, np.float32)


def build_hunyuan_vae_sd(cfg):
    rng = np.random.default_rng(1)
    dims = list(cfg.base_dims)
    z = cfg.z_dim
    sd = {}
    rev = list(reversed(dims))
    top = rev[0]
    sd["decoder.conv_in.weight"] = _conv3(rng, top, z)
    sd["decoder.conv_in.bias"] = np.zeros(top, np.float32)
    _hy_res(rng, sd, "decoder.mid_block.resnets.0", top, top)
    _hy_attn(rng, sd, "decoder.mid_block.attentions.0", top)
    _hy_res(rng, sd, "decoder.mid_block.resnets.1", top, top)
    cin = top
    for i, cout in enumerate(rev):
        p = f"decoder.up_blocks.{i}"
        for j in range(cfg.layers_per_block + 1):
            _hy_res(rng, sd, f"{p}.resnets.{j}", cin if j == 0 else cout, cout)
        if i < len(rev) - 1:
            sd[f"{p}.upsamplers.0.conv.weight"] = _conv3(rng, cout, cout)
            sd[f"{p}.upsamplers.0.conv.bias"] = np.zeros(cout, np.float32)
        cin = cout
    sd["decoder.conv_norm_out.weight"] = np.ones(rev[-1], np.float32)
    sd["decoder.conv_norm_out.bias"] = np.zeros(rev[-1], np.float32)
    sd["decoder.conv_out.weight"] = _conv3(rng, 3, rev[-1])
    sd["decoder.conv_out.bias"] = np.zeros(3, np.float32)

    sd["encoder.conv_in.weight"] = _conv3(rng, dims[0], 3)
    sd["encoder.conv_in.bias"] = np.zeros(dims[0], np.float32)
    cin = dims[0]
    for i, cout in enumerate(dims):
        p = f"encoder.down_blocks.{i}"
        for j in range(cfg.layers_per_block):
            _hy_res(rng, sd, f"{p}.resnets.{j}", cin if j == 0 else cout, cout)
        if i < len(dims) - 1:
            sd[f"{p}.downsamplers.0.conv.weight"] = _conv3(rng, cout, cout)
            sd[f"{p}.downsamplers.0.conv.bias"] = np.zeros(cout, np.float32)
        cin = cout
    _hy_res(rng, sd, "encoder.mid_block.resnets.0", dims[-1], dims[-1])
    _hy_attn(rng, sd, "encoder.mid_block.attentions.0", dims[-1])
    _hy_res(rng, sd, "encoder.mid_block.resnets.1", dims[-1], dims[-1])
    sd["encoder.conv_norm_out.weight"] = np.ones(dims[-1], np.float32)
    sd["encoder.conv_norm_out.bias"] = np.zeros(dims[-1], np.float32)
    sd["encoder.conv_out.weight"] = _conv3(rng, 2 * z, dims[-1])
    sd["encoder.conv_out.bias"] = np.zeros(2 * z, np.float32)
    return sd


def test_hunyuan_vae_import(tmp_path):
    import torch

    cfg = HUNYUAN_VAE_TINY
    sd = build_hunyuan_vae_sd(cfg)
    path = tmp_path / "vae.pt"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)

    vae = HunyuanVAE(cfg, rngs=nnx.Rngs(0))
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 4, 4, cfg.z_dim))
    before = np.asarray(vae.decode(z, denormalize=False))
    applied, missing = load_hunyuan_vae_torch_weights(vae, path)
    assert not missing
    assert len(applied) > 40
    after = np.asarray(vae.decode(z, denormalize=False))
    assert not np.allclose(before, after)
    w = np.asarray(vae.decoder.conv_in.conv.kernel[...])
    np.testing.assert_allclose(
        w, sd["decoder.conv_in.weight"].transpose(2, 3, 4, 1, 0), rtol=1e-6
    )
