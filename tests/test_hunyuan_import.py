"""Hunyuan weight-import parity vs independent torch oracles (per component).

Pins every convention in io/torch_import.hunyuan_state_dict_to_tree:
AdaLN chunk orders (diffusers AdaLayerNormZero: shift,scale,gate x2;
Single: shift,scale,gate; Continuous: scale,shift), per-head RMS qk-norm,
joint attention concatenation order, token-refiner gating, theta-256
axis-split RoPE.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from flax import nnx

from vorta_tpu.config import AttentionConfig
from vorta_tpu.io.torch_import import hunyuan_state_dict_to_tree, _apply_tree
from vorta_tpu.models.hunyuan import (
    HunyuanModel,
    HunyuanModelConfig,
    hunyuan_rope_tables,
)

CFG = HunyuanModelConfig(
    dim=128, num_heads=2, head_dim=64, dual_layers=1, single_layers=1,
    text_dim=48, text_len=24, pooled_dim=32, rope_axes=(16, 24, 24),
    freq_dim=32, refiner_layers=1, mlp_ratio=2.0,
)
GRID = (4, 4, 8)
ATTN = AttentionConfig(
    latent_shape=GRID, sta_window=(3, 3, 3), sta_tile=(2, 2, 2),
    lowres_window=(2, 2, 2), block_q=32, block_kv=32,
)


def make_state(seed=0):
    g = torch.Generator().manual_seed(seed)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    d, mlp = CFG.dim, int(CFG.dim * CFG.mlp_ratio)
    sd = {
        "x_embedder.proj.weight": r(d, CFG.in_channels, 1, 2, 2),
        "x_embedder.proj.bias": r(d),
        "time_text_embed.timestep_embedder.linear_1.weight": r(d, CFG.freq_dim),
        "time_text_embed.timestep_embedder.linear_1.bias": r(d),
        "time_text_embed.timestep_embedder.linear_2.weight": r(d, d),
        "time_text_embed.timestep_embedder.linear_2.bias": r(d),
        "time_text_embed.guidance_embedder.linear_1.weight": r(d, CFG.freq_dim),
        "time_text_embed.guidance_embedder.linear_1.bias": r(d),
        "time_text_embed.guidance_embedder.linear_2.weight": r(d, d),
        "time_text_embed.guidance_embedder.linear_2.bias": r(d),
        "time_text_embed.text_embedder.linear_1.weight": r(d, CFG.pooled_dim),
        "time_text_embed.text_embedder.linear_1.bias": r(d),
        "time_text_embed.text_embedder.linear_2.weight": r(d, d),
        "time_text_embed.text_embedder.linear_2.bias": r(d),
        "context_embedder.proj_in.weight": r(d, CFG.text_dim),
        "context_embedder.proj_in.bias": r(d),
        "context_embedder.time_text_embed.timestep_embedder.linear_1.weight": r(d, CFG.freq_dim),
        "context_embedder.time_text_embed.timestep_embedder.linear_1.bias": r(d),
        "context_embedder.time_text_embed.timestep_embedder.linear_2.weight": r(d, d),
        "context_embedder.time_text_embed.timestep_embedder.linear_2.bias": r(d),
        "context_embedder.time_text_embed.text_embedder.linear_1.weight": r(d, CFG.text_dim),
        "context_embedder.time_text_embed.text_embedder.linear_1.bias": r(d),
        "context_embedder.time_text_embed.text_embedder.linear_2.weight": r(d, d),
        "context_embedder.time_text_embed.text_embedder.linear_2.bias": r(d),
        "norm_out.linear.weight": r(2 * d, d),
        "norm_out.linear.bias": r(2 * d),
        "proj_out.weight": r(CFG.out_channels * 4, d),
        "proj_out.bias": r(CFG.out_channels * 4),
    }
    p = "context_embedder.token_refiner.refiner_blocks.0"
    sd.update({
        f"{p}.norm1.weight": 1 + r(d), f"{p}.norm1.bias": r(d),
        f"{p}.attn.to_q.weight": r(d, d), f"{p}.attn.to_q.bias": r(d),
        f"{p}.attn.to_k.weight": r(d, d), f"{p}.attn.to_k.bias": r(d),
        f"{p}.attn.to_v.weight": r(d, d), f"{p}.attn.to_v.bias": r(d),
        f"{p}.attn.to_out.0.weight": r(d, d), f"{p}.attn.to_out.0.bias": r(d),
        f"{p}.norm2.weight": 1 + r(d), f"{p}.norm2.bias": r(d),
        f"{p}.ff.net.0.proj.weight": r(mlp, d), f"{p}.ff.net.0.proj.bias": r(mlp),
        f"{p}.ff.net.2.weight": r(d, mlp), f"{p}.ff.net.2.bias": r(d),
        f"{p}.norm_out.linear.weight": r(2 * d, d), f"{p}.norm_out.linear.bias": r(2 * d),
    })
    p = "transformer_blocks.0"
    sd.update({
        f"{p}.norm1.linear.weight": r(6 * d, d), f"{p}.norm1.linear.bias": r(6 * d),
        f"{p}.norm1_context.linear.weight": r(6 * d, d), f"{p}.norm1_context.linear.bias": r(6 * d),
        f"{p}.attn.norm_q.weight": 1 + r(CFG.head_dim),
        f"{p}.attn.norm_k.weight": 1 + r(CFG.head_dim),
        f"{p}.attn.norm_added_q.weight": 1 + r(CFG.head_dim),
        f"{p}.attn.norm_added_k.weight": 1 + r(CFG.head_dim),
        f"{p}.attn.to_out.0.weight": r(d, d), f"{p}.attn.to_out.0.bias": r(d),
        f"{p}.attn.to_add_out.weight": r(d, d), f"{p}.attn.to_add_out.bias": r(d),
        f"{p}.ff.net.0.proj.weight": r(mlp, d), f"{p}.ff.net.0.proj.bias": r(mlp),
        f"{p}.ff.net.2.weight": r(d, mlp), f"{p}.ff.net.2.bias": r(d),
        f"{p}.ff_context.net.0.proj.weight": r(mlp, d), f"{p}.ff_context.net.0.proj.bias": r(mlp),
        f"{p}.ff_context.net.2.weight": r(d, mlp), f"{p}.ff_context.net.2.bias": r(d),
    })
    for proj in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
        sd[f"{p}.attn.{proj}.weight"] = r(d, d)
        sd[f"{p}.attn.{proj}.bias"] = r(d)
    p = "single_transformer_blocks.0"
    sd.update({
        f"{p}.norm.linear.weight": r(3 * d, d), f"{p}.norm.linear.bias": r(3 * d),
        f"{p}.attn.norm_q.weight": 1 + r(CFG.head_dim),
        f"{p}.attn.norm_k.weight": 1 + r(CFG.head_dim),
        f"{p}.proj_mlp.weight": r(mlp, d), f"{p}.proj_mlp.bias": r(mlp),
        f"{p}.proj_out.weight": r(d, d + mlp), f"{p}.proj_out.bias": r(d),
    })
    for proj in ("to_q", "to_k", "to_v"):
        sd[f"{p}.attn.{proj}.weight"] = r(d, d)
        sd[f"{p}.attn.{proj}.bias"] = r(d)
    return sd


def torch_rope(grid):
    counts = [x // 2 for x in CFG.rope_axes]
    axes = []
    for n, c in zip(grid, counts):
        k = torch.arange(c, dtype=torch.float64)
        inv = CFG.rope_theta ** (-k / c)
        axes.append(torch.outer(torch.arange(n, dtype=torch.float64), inv))
    t, h, w = grid
    ft = axes[0].view(t, 1, 1, -1).expand(t, h, w, counts[0])
    fh = axes[1].view(1, h, 1, -1).expand(t, h, w, counts[1])
    fw = axes[2].view(1, 1, w, -1).expand(t, h, w, counts[2])
    ang = torch.cat([ft, fh, fw], dim=-1).reshape(t * h * w, -1)
    return torch.polar(torch.ones_like(ang), ang)


def torch_apply_rope(x, freqs):
    xc = torch.view_as_complex(x.to(torch.float64).unflatten(-1, (-1, 2)))
    return torch.view_as_real(xc * freqs).flatten(-2).to(x.dtype)


def rms_per_head(x, w):
    xf = x.float()
    out = xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + CFG.eps)
    return (out * w.float()).to(x.dtype)


def lin(sd, p, x):
    return F.linear(x, sd[f"{p}.weight"], sd[f"{p}.bias"])


def torch_joint_attention(sd, p, x, ctx, freqs):
    h = CFG.num_heads

    def heads(t):
        return t.unflatten(2, (h, -1)).transpose(1, 2)

    q = rms_per_head(heads(lin(sd, f"{p}.to_q", x)), sd[f"{p}.norm_q.weight"])
    k = rms_per_head(heads(lin(sd, f"{p}.to_k", x)), sd[f"{p}.norm_k.weight"])
    v = heads(lin(sd, f"{p}.to_v", x))
    qc = rms_per_head(heads(lin(sd, f"{p}.add_q_proj", ctx)), sd[f"{p}.norm_added_q.weight"])
    kc = rms_per_head(heads(lin(sd, f"{p}.add_k_proj", ctx)), sd[f"{p}.norm_added_k.weight"])
    vc = heads(lin(sd, f"{p}.add_v_proj", ctx))
    q = torch.cat([torch_apply_rope(q, freqs), qc], dim=2)
    k = torch.cat([torch_apply_rope(k, freqs), kc], dim=2)
    v = torch.cat([v, vc], dim=2)
    out = F.scaled_dot_product_attention(q, k, v)
    out = out.transpose(1, 2).flatten(2)
    sv = x.shape[1]
    return lin(sd, f"{p}.to_out.0", out[:, :sv]), lin(sd, f"{p}.to_add_out", out[:, sv:])


def torch_dual_block(sd, x, ctx, temb, freqs):
    p = "transformer_blocks.0"
    mod = lin(sd, f"{p}.norm1.linear", F.silu(temb)).float()
    sh, sc, gate, shm, scm, gm = mod.chunk(6, dim=-1)
    cmod = lin(sd, f"{p}.norm1_context.linear", F.silu(temb)).float()
    csh, csc, cgate, cshm, cscm, cgm = cmod.chunk(6, dim=-1)
    nx = (F.layer_norm(x.float(), (CFG.dim,), eps=CFG.eps) * (1 + sc[:, None]) + sh[:, None]).type_as(x)
    nc = (F.layer_norm(ctx.float(), (CFG.dim,), eps=CFG.eps) * (1 + csc[:, None]) + csh[:, None]).type_as(ctx)
    ax, ac = torch_joint_attention(sd, f"{p}.attn", nx, nc, freqs)
    x = (x.float() + ax.float() * gate[:, None]).type_as(x)
    ctx = (ctx.float() + ac.float() * cgate[:, None]).type_as(ctx)
    nx = (F.layer_norm(x.float(), (CFG.dim,), eps=CFG.eps) * (1 + scm[:, None]) + shm[:, None]).type_as(x)
    nc = (F.layer_norm(ctx.float(), (CFG.dim,), eps=CFG.eps) * (1 + cscm[:, None]) + cshm[:, None]).type_as(ctx)
    ffx = lin(sd, f"{p}.ff.net.2", F.gelu(lin(sd, f"{p}.ff.net.0.proj", nx), approximate="tanh"))
    ffc = lin(sd, f"{p}.ff_context.net.2", F.gelu(lin(sd, f"{p}.ff_context.net.0.proj", nc), approximate="tanh"))
    x = (x.float() + gm[:, None] * ffx.float()).type_as(x)
    ctx = (ctx.float() + cgm[:, None] * ffc.float()).type_as(ctx)
    return x, ctx


def torch_single_block(sd, x, ctx, temb, freqs):
    p = "single_transformer_blocks.0"
    text_len = ctx.shape[1]
    joint = torch.cat([x, ctx], dim=1)
    residual = joint
    mod = lin(sd, f"{p}.norm.linear", F.silu(temb)).float()
    sh, sc, gate = mod.chunk(3, dim=-1)
    nj = (F.layer_norm(joint.float(), (CFG.dim,), eps=CFG.eps) * (1 + sc[:, None]) + sh[:, None]).type_as(joint)
    mlp = F.gelu(lin(sd, f"{p}.proj_mlp", nj), approximate="tanh")
    h = CFG.num_heads

    def heads(t):
        return t.unflatten(2, (h, -1)).transpose(1, 2)

    q = rms_per_head(heads(lin(sd, f"{p}.attn.to_q", nj)), sd[f"{p}.attn.norm_q.weight"])
    k = rms_per_head(heads(lin(sd, f"{p}.attn.to_k", nj)), sd[f"{p}.attn.norm_k.weight"])
    v = heads(lin(sd, f"{p}.attn.to_v", nj))
    qv, qt = q[:, :, :-text_len], q[:, :, -text_len:]
    kv_, kt = k[:, :, :-text_len], k[:, :, -text_len:]
    q = torch.cat([torch_apply_rope(qv, freqs), qt], dim=2)
    k = torch.cat([torch_apply_rope(kv_, freqs), kt], dim=2)
    attn = F.scaled_dot_product_attention(q, k, v).transpose(1, 2).flatten(2)
    out = lin(sd, f"{p}.proj_out", torch.cat([attn, mlp], dim=2))
    joint = (residual.float() + gate[:, None] * out.float()).type_as(joint)
    return joint[:, :-text_len], joint[:, -text_len:]


@pytest.fixture(scope="module")
def setup():
    sd = make_state()
    model = HunyuanModel(CFG, rngs=nnx.Rngs(0))
    tree = hunyuan_state_dict_to_tree(
        {k: v.numpy() for k, v in sd.items()},
        CFG.dual_layers, CFG.single_layers, CFG.refiner_layers,
        CFG.head_dim,
    )
    graphdef, state = nnx.split(model)
    applied, missing = _apply_tree(state, tree)
    assert not missing, missing
    nnx.update(model, state)
    return sd, model


def test_dual_block_parity(setup):
    sd, model = setup
    g = torch.Generator().manual_seed(1)
    sv = int(np.prod(GRID))
    x = torch.randn(1, sv, CFG.dim, generator=g)
    ctx = torch.randn(1, CFG.text_len, CFG.dim, generator=g)
    temb = torch.randn(1, CFG.dim, generator=g)
    freqs = torch_rope(GRID)
    with torch.no_grad():
        ref_x, ref_c = torch_dual_block(sd, x, ctx, temb, freqs)

    block = nnx.merge(*nnx.split(model.dual_blocks))  # stacked, take layer 0 via vmapped state
    # simpler: call through the model's stacked state by slicing layer 0
    graphdef, state = nnx.split(model.dual_blocks)
    state0 = jax.tree.map(lambda a: a[0], state)
    blk = nnx.merge(graphdef, state0)
    rope = hunyuan_rope_tables(GRID, CFG)
    mask = jnp.ones((1, CFG.text_len), bool)
    from vorta_tpu.ops.joint_experts import JointConfig

    jcfg = JointConfig(video=ATTN, text_len=CFG.text_len)
    out_x, out_c, _ = blk(
        jnp.asarray(x.numpy()), jnp.asarray(ctx.numpy()), jnp.asarray(temb.numpy()),
        jnp.asarray(temb.numpy()), rope, mask, jcfg, "off", True,
    )
    np.testing.assert_allclose(np.asarray(out_x), ref_x.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_c), ref_c.numpy(), rtol=2e-4, atol=2e-4)


def test_single_block_parity(setup):
    sd, model = setup
    g = torch.Generator().manual_seed(2)
    sv = int(np.prod(GRID))
    x = torch.randn(1, sv, CFG.dim, generator=g)
    ctx = torch.randn(1, CFG.text_len, CFG.dim, generator=g)
    temb = torch.randn(1, CFG.dim, generator=g)
    with torch.no_grad():
        ref_x, ref_c = torch_single_block(sd, x, ctx, temb, torch_rope(GRID))

    graphdef, state = nnx.split(model.single_blocks)
    state0 = jax.tree.map(lambda a: a[0], state)
    blk = nnx.merge(graphdef, state0)
    from vorta_tpu.ops.joint_experts import JointConfig

    jcfg = JointConfig(video=ATTN, text_len=CFG.text_len)
    out_x, out_c, _ = blk(
        jnp.asarray(x.numpy()), jnp.asarray(ctx.numpy()), jnp.asarray(temb.numpy()),
        jnp.asarray(temb.numpy()), hunyuan_rope_tables(GRID, CFG),
        jnp.ones((1, CFG.text_len), bool), jcfg, "off", True,
    )
    np.testing.assert_allclose(np.asarray(out_x), ref_x.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_c), ref_c.numpy(), rtol=2e-4, atol=2e-4)


def test_refiner_block_parity(setup):
    sd, model = setup
    p = "context_embedder.token_refiner.refiner_blocks.0"
    g = torch.Generator().manual_seed(3)
    x = torch.randn(1, CFG.text_len, CFG.dim, generator=g)
    c = torch.randn(1, CFG.dim, generator=g)
    mask_t = torch.ones(1, CFG.text_len, dtype=torch.bool)
    with torch.no_grad():
        gates = lin(sd, f"{p}.norm_out.linear", F.silu(c)).float()
        g1, g2 = gates.chunk(2, dim=-1)
        nx = F.layer_norm(x.float(), (CFG.dim,), sd[f"{p}.norm1.weight"].float(),
                          sd[f"{p}.norm1.bias"].float(), eps=CFG.eps).type_as(x)
        h = CFG.num_heads
        q = lin(sd, f"{p}.attn.to_q", nx).unflatten(2, (h, -1)).transpose(1, 2)
        k = lin(sd, f"{p}.attn.to_k", nx).unflatten(2, (h, -1)).transpose(1, 2)
        v = lin(sd, f"{p}.attn.to_v", nx).unflatten(2, (h, -1)).transpose(1, 2)
        attn = F.scaled_dot_product_attention(q, k, v).transpose(1, 2).flatten(2)
        x1 = (x.float() + lin(sd, f"{p}.attn.to_out.0", attn).float() * g1[:, None]).type_as(x)
        n2 = F.layer_norm(x1.float(), (CFG.dim,), sd[f"{p}.norm2.weight"].float(),
                          sd[f"{p}.norm2.bias"].float(), eps=CFG.eps).type_as(x1)
        ff = lin(sd, f"{p}.ff.net.2", F.gelu(lin(sd, f"{p}.ff.net.0.proj", n2), approximate="tanh"))
        ref = (x1.float() + ff.float() * g2[:, None]).type_as(x1)

    blk = model.context_embedder.blocks[0]
    out = blk(jnp.asarray(x.numpy()), jnp.asarray(c.numpy()), jnp.ones((1, CFG.text_len), bool))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=2e-4, atol=2e-4)


def test_combined_embedder_parity(setup):
    sd, model = setup
    t = torch.tensor([500.0])
    guidance = torch.tensor([6000.0])
    pooled = torch.randn(1, CFG.pooled_dim, generator=torch.Generator().manual_seed(4))
    half = CFG.freq_dim // 2
    exponent = -math.log(10000.0) * torch.arange(half) / half

    def sinus(v):
        e = v.float()[:, None] * torch.exp(exponent)[None]
        return torch.cat([e.cos(), e.sin()], dim=-1)

    def mlp(prefix, inp):
        h = lin(sd, f"{prefix}.linear_1", inp)
        return lin(sd, f"{prefix}.linear_2", F.silu(h))

    with torch.no_grad():
        t_emb = mlp("time_text_embed.timestep_embedder", sinus(t))
        g_emb = mlp("time_text_embed.guidance_embedder", sinus(guidance))
        pe = lin(sd, "time_text_embed.text_embedder.linear_2",
                 F.silu(lin(sd, "time_text_embed.text_embedder.linear_1", pooled)))
        ref = t_emb + pe + g_emb

    temb, clean, tr_emb = model.time_text_embed(
        jnp.asarray([500.0]), jnp.asarray(pooled.numpy()), jnp.asarray([6000.0])
    )
    assert tr_emb is None  # token_replace off for plain T2V
    np.testing.assert_allclose(np.asarray(temb), ref.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(clean), t_emb.numpy(), rtol=2e-4, atol=2e-4)
