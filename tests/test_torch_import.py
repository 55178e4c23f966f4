"""Weight-import parity: our NNX Wan vs an independent torch oracle.

The oracle implements the Wan DiT forward in torch from the architecture
spec (diffusers WanTransformer3DModel semantics: FP32 LayerNorms, RMS qk-norm
across the projected dim, f64-complex RoPE, AdaLN tables, gelu-tanh FFN).
Random torch weights with diffusers key names are imported into the NNX model
and the two forwards must agree — this pins every transpose and ordering
convention in io/torch_import.py.
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from flax import nnx

from vorta_tpu.config import WanModelConfig
from vorta_tpu.io.torch_import import (
    load_router_torch_checkpoint,
    load_wan_torch_weights,
    wan_state_dict_to_tree,
)
from vorta_tpu.models.wan import WanModel

CFG = WanModelConfig(
    dim=128, ffn_dim=256, num_heads=2, head_dim=64, num_layers=2,
    text_dim=32, text_len=16, freq_dim=32, in_channels=16, out_channels=16,
)
GRID = (4, 4, 4)  # token grid; pixels (4, 8, 8)
IMAGE_DIM = 48  # stands in for CLIP's 1280
CFG_I2V = dataclasses.replace(CFG, image_dim=IMAGE_DIM)


def make_torch_state(seed=0, i2v=False):
    g = torch.Generator().manual_seed(seed)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {
        "patch_embedding.weight": r(CFG.dim, CFG.in_channels, 1, 2, 2),
        "patch_embedding.bias": r(CFG.dim),
        "condition_embedder.time_embedder.linear_1.weight": r(CFG.dim, CFG.freq_dim),
        "condition_embedder.time_embedder.linear_1.bias": r(CFG.dim),
        "condition_embedder.time_embedder.linear_2.weight": r(CFG.dim, CFG.dim),
        "condition_embedder.time_embedder.linear_2.bias": r(CFG.dim),
        "condition_embedder.time_proj.weight": r(CFG.dim * 6, CFG.dim),
        "condition_embedder.time_proj.bias": r(CFG.dim * 6),
        "condition_embedder.text_embedder.linear_1.weight": r(CFG.dim, CFG.text_dim),
        "condition_embedder.text_embedder.linear_1.bias": r(CFG.dim),
        "condition_embedder.text_embedder.linear_2.weight": r(CFG.dim, CFG.dim),
        "condition_embedder.text_embedder.linear_2.bias": r(CFG.dim),
        "proj_out.weight": r(CFG.out_channels * 4, CFG.dim),
        "proj_out.bias": r(CFG.out_channels * 4),
        "scale_shift_table": r(1, 2, CFG.dim),
    }
    for i in range(CFG.num_layers):
        p = f"blocks.{i}"
        for attn in ("attn1", "attn2"):
            for proj in ("to_q", "to_k", "to_v"):
                sd[f"{p}.{attn}.{proj}.weight"] = r(CFG.dim, CFG.dim)
                sd[f"{p}.{attn}.{proj}.bias"] = r(CFG.dim)
            sd[f"{p}.{attn}.to_out.0.weight"] = r(CFG.dim, CFG.dim)
            sd[f"{p}.{attn}.to_out.0.bias"] = r(CFG.dim)
            sd[f"{p}.{attn}.norm_q.weight"] = 1 + r(CFG.dim)
            sd[f"{p}.{attn}.norm_k.weight"] = 1 + r(CFG.dim)
        sd[f"{p}.norm2.weight"] = 1 + r(CFG.dim)
        sd[f"{p}.norm2.bias"] = r(CFG.dim)
        sd[f"{p}.ffn.net.0.proj.weight"] = r(CFG.ffn_dim, CFG.dim)
        sd[f"{p}.ffn.net.0.proj.bias"] = r(CFG.ffn_dim)
        sd[f"{p}.ffn.net.2.weight"] = r(CFG.dim, CFG.ffn_dim)
        sd[f"{p}.ffn.net.2.bias"] = r(CFG.dim)
        sd[f"{p}.scale_shift_table"] = r(1, 6, CFG.dim)
        sd[f"{p}.router.linear.weight"] = r(CFG.num_heads * 3, CFG.dim)
        sd[f"{p}.router.linear.bias"] = r(CFG.num_heads * 3)
        if i2v:
            sd[f"{p}.attn2.add_k_proj.weight"] = r(CFG.dim, CFG.dim)
            sd[f"{p}.attn2.add_k_proj.bias"] = r(CFG.dim)
            sd[f"{p}.attn2.add_v_proj.weight"] = r(CFG.dim, CFG.dim)
            sd[f"{p}.attn2.add_v_proj.bias"] = r(CFG.dim)
            sd[f"{p}.attn2.norm_added_k.weight"] = 1 + r(CFG.dim)
    if i2v:
        ce = "condition_embedder.image_embedder"
        sd[f"{ce}.norm1.weight"] = 1 + r(IMAGE_DIM)
        sd[f"{ce}.norm1.bias"] = r(IMAGE_DIM)
        sd[f"{ce}.ff.net.0.proj.weight"] = r(IMAGE_DIM, IMAGE_DIM)
        sd[f"{ce}.ff.net.0.proj.bias"] = r(IMAGE_DIM)
        sd[f"{ce}.ff.net.2.weight"] = r(CFG.dim, IMAGE_DIM)
        sd[f"{ce}.ff.net.2.bias"] = r(CFG.dim)
        sd[f"{ce}.norm2.weight"] = 1 + r(CFG.dim)
        sd[f"{ce}.norm2.bias"] = r(CFG.dim)
    return sd


def torch_rope_freqs():
    d = CFG.head_dim
    d6 = d // 6
    counts = [d // 2 - 2 * d6, d6, d6]
    t, h, w = GRID
    axes = []
    for n, c in zip(GRID, counts):
        k = torch.arange(c, dtype=torch.float64)
        inv = 10000.0 ** (-k / c)
        ang = torch.outer(torch.arange(n, dtype=torch.float64), inv)
        axes.append(torch.polar(torch.ones_like(ang), ang))
    ft = axes[0].view(t, 1, 1, counts[0]).expand(t, h, w, counts[0])
    fh = axes[1].view(1, h, 1, counts[1]).expand(t, h, w, counts[1])
    fw = axes[2].view(1, 1, w, counts[2]).expand(t, h, w, counts[2])
    return torch.cat([ft, fh, fw], dim=-1).reshape(t * h * w, d // 2)


def torch_apply_rope(x, freqs):
    xc = torch.view_as_complex(x.to(torch.float64).unflatten(-1, (-1, 2)))
    return torch.view_as_real(xc * freqs).flatten(-2).to(x.dtype)


def torch_image_embed(sd, img):
    """diffusers WanImageEmbedding: FP32LayerNorm (torch default eps=1e-5)
    -> FeedForward(mult=1, activation_fn="gelu" == EXACT gelu) -> FP32LayerNorm."""
    ce = "condition_embedder.image_embedder"
    h = F.layer_norm(
        img.float(), (IMAGE_DIM,),
        sd[f"{ce}.norm1.weight"].float(), sd[f"{ce}.norm1.bias"].float(), eps=1e-5,
    )
    h = F.linear(h, sd[f"{ce}.ff.net.0.proj.weight"], sd[f"{ce}.ff.net.0.proj.bias"])
    h = F.linear(F.gelu(h), sd[f"{ce}.ff.net.2.weight"], sd[f"{ce}.ff.net.2.bias"])
    return F.layer_norm(
        h.float(), (CFG.dim,),
        sd[f"{ce}.norm2.weight"].float(), sd[f"{ce}.norm2.bias"].float(), eps=1e-5,
    )


def torch_wan_forward(sd, latents, timestep, ctx, img=None):
    def lin(p, x):
        return F.linear(x, sd[f"{p}.weight"], sd[f"{p}.bias"])

    def rms(x, w):
        xf = x.float()
        out = xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + CFG.eps)
        return (out * w.float()).to(x.dtype)

    b = latents.shape[0]
    x = F.conv3d(latents, sd["patch_embedding.weight"], sd["patch_embedding.bias"], stride=(1, 2, 2))
    x = x.flatten(2).transpose(1, 2)  # (B, S, dim)

    half = CFG.freq_dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    emb = timestep.float()[:, None] * torch.exp(exponent)[None]
    sinusoid = torch.cat([emb.cos(), emb.sin()], dim=-1)
    temb = lin("condition_embedder.time_embedder.linear_2",
               F.silu(lin("condition_embedder.time_embedder.linear_1", sinusoid)))
    temb6 = lin("condition_embedder.time_proj", F.silu(temb)).unflatten(1, (6, CFG.dim))
    ctx = lin("condition_embedder.text_embedder.linear_2",
              F.gelu(lin("condition_embedder.text_embedder.linear_1", ctx), approximate="tanh"))

    freqs = torch_rope_freqs()
    img_emb = torch_image_embed(sd, img) if img is not None else None

    def heads(x):
        return x.unflatten(2, (CFG.num_heads, -1)).transpose(1, 2)

    def attention(p, xq, xkv, use_rope, with_image=False):
        q = heads(rms(lin(f"{p}.to_q", xq), sd[f"{p}.norm_q.weight"]))
        k = heads(rms(lin(f"{p}.to_k", xkv), sd[f"{p}.norm_k.weight"]))
        v = heads(lin(f"{p}.to_v", xkv))
        if use_rope:
            q = torch_apply_rope(q, freqs)
            k = torch_apply_rope(k, freqs)
        out = F.scaled_dot_product_attention(q, k, v)
        if with_image and img_emb is not None:
            # reference wan.py:119-139: separate K/V projections over the
            # image tokens, attention outputs summed
            ki = heads(rms(lin(f"{p}.add_k_proj", img_emb.type_as(xq)),
                           sd[f"{p}.norm_added_k.weight"]))
            vi = heads(lin(f"{p}.add_v_proj", img_emb.type_as(xq)))
            out = out + F.scaled_dot_product_attention(q, ki, vi)
        out = out.transpose(1, 2).flatten(2)
        return lin(f"{p}.to_out.0", out)

    for i in range(CFG.num_layers):
        p = f"blocks.{i}"
        mod = sd[f"{p}.scale_shift_table"] + temb6.float()
        sh, sc, gate, csh, csc, cgate = [mod[:, j].unsqueeze(1) for j in range(6)]
        norm_x = (F.layer_norm(x.float(), (CFG.dim,), eps=CFG.eps) * (1 + sc) + sh).type_as(x)
        x = (x.float() + attention(f"{p}.attn1", norm_x, norm_x, True).float() * gate).type_as(x)
        norm_x = F.layer_norm(
            x.float(), (CFG.dim,), sd[f"{p}.norm2.weight"].float(),
            sd[f"{p}.norm2.bias"].float(), eps=CFG.eps,
        ).type_as(x)
        x = x + attention(f"{p}.attn2", norm_x, ctx, False, with_image=True)
        norm_x = (F.layer_norm(x.float(), (CFG.dim,), eps=CFG.eps) * (1 + csc) + csh).type_as(x)
        ffn = lin(f"{p}.ffn.net.2", F.gelu(lin(f"{p}.ffn.net.0.proj", norm_x), approximate="tanh"))
        x = (x.float() + ffn.float() * cgate).type_as(x)

    mod = sd["scale_shift_table"] + temb.float().unsqueeze(1)
    sh, sc = mod[:, 0].unsqueeze(1), mod[:, 1].unsqueeze(1)
    x = (F.layer_norm(x.float(), (CFG.dim,), eps=CFG.eps) * (1 + sc) + sh).type_as(x)
    x = lin("proj_out", x)
    # unpatchify (B, S, C*pt*ph*pw) -> (B, C, T, H, W)
    t, h, w = GRID
    x = x.reshape(b, t, h, w, 1, 2, 2, CFG.out_channels)
    x = x.permute(0, 7, 1, 4, 2, 5, 3, 6)
    return x.flatten(6, 7).flatten(4, 5).flatten(2, 3)


@pytest.fixture(scope="module")
def torch_sd():
    return make_torch_state()


def test_state_dict_tree_shapes(torch_sd):
    sd_np = {k: v.numpy() for k, v in torch_sd.items()}
    tree = wan_state_dict_to_tree(sd_np, CFG.num_layers, CFG.head_dim)
    assert tree["patch_embedding"]["kernel"].shape == (1, 2, 2, CFG.in_channels, CFG.dim)
    assert tree["blocks"]["attn1"]["to_q"]["kernel"].shape == (CFG.num_layers, CFG.dim, CFG.dim)
    assert tree["blocks"]["scale_shift_table"].shape == (CFG.num_layers, 1, 6, CFG.dim)
    assert tree["blocks"]["router"]["linear"]["kernel"].shape == (
        CFG.num_layers, CFG.dim, CFG.num_heads * 3,
    )


def test_forward_parity_with_torch_oracle(torch_sd, tmp_path):
    torch.save({k: v for k, v in torch_sd.items()}, tmp_path / "model.pt")

    model = WanModel(CFG, rngs=nnx.Rngs(0))
    applied, missing = load_wan_torch_weights(model, tmp_path / "model.pt")
    assert not missing, missing
    assert len(applied) > 40

    b = 2
    g = torch.Generator().manual_seed(1)
    latents_t = torch.randn(b, CFG.in_channels, 4, 8, 8, generator=g)
    ctx_t = torch.randn(b, CFG.text_len, CFG.text_dim, generator=g)
    timestep = torch.tensor([300.0, 700.0])

    with torch.no_grad():
        ref = torch_wan_forward(torch_sd, latents_t, timestep, ctx_t).numpy()

    out = model(
        jnp.asarray(latents_t.numpy().transpose(0, 2, 3, 4, 1)),
        jnp.asarray(timestep.numpy()),
        jnp.asarray(ctx_t.numpy()),
        routing_mode="off",
        interpret=True,
    ).sample
    out_t = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out_t, ref, rtol=2e-4, atol=2e-4)


def test_i2v_forward_parity_with_torch_oracle(tmp_path):
    """I2V variant: image_embedder import + add_k/v_proj cross-attn branch
    (reference modeling_wan.py:77-83, wan.py:119-139) vs the torch oracle."""
    sd = make_torch_state(seed=3, i2v=True)
    torch.save(sd, tmp_path / "model.pt")

    model = WanModel(CFG_I2V, rngs=nnx.Rngs(0))
    applied, missing = load_wan_torch_weights(model, tmp_path / "model.pt")
    assert not missing, missing

    b = 1
    g = torch.Generator().manual_seed(4)
    latents_t = torch.randn(b, CFG.in_channels, 4, 8, 8, generator=g)
    ctx_t = torch.randn(b, CFG.text_len, CFG.text_dim, generator=g)
    img_t = torch.randn(b, 5, IMAGE_DIM, generator=g)  # 5 stands in for CLIP's 257
    timestep = torch.tensor([500.0])

    with torch.no_grad():
        ref = torch_wan_forward(sd, latents_t, timestep, ctx_t, img=img_t).numpy()

    out = model(
        jnp.asarray(latents_t.numpy().transpose(0, 2, 3, 4, 1)),
        jnp.asarray(timestep.numpy()),
        jnp.asarray(ctx_t.numpy()),
        routing_mode="off",
        image_context=jnp.asarray(img_t.numpy()),
        interpret=True,
    ).sample
    out_t = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out_t, ref, rtol=2e-4, atol=2e-4)


def test_router_checkpoint_import(torch_sd, tmp_path):
    router_sd = {k: v for k, v in torch_sd.items() if "router" in k}
    torch.save(router_sd, tmp_path / "router.pt")
    model = WanModel(CFG, rngs=nnx.Rngs(0))
    before = np.asarray(model.blocks.router.linear.kernel[...]).copy()
    applied, missing = load_router_torch_checkpoint(model, tmp_path / "router.pt")
    assert not missing
    after = np.asarray(model.blocks.router.linear.kernel[...])
    assert np.abs(after - before).max() > 0
    # imported kernel matches torch weight transposed, stacked over layers
    expect = np.stack(
        [torch_sd[f"blocks.{i}.router.linear.weight"].numpy().T for i in range(CFG.num_layers)]
    )
    np.testing.assert_allclose(after, expect, rtol=1e-6)
