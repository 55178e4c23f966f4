"""Fused qk prologue (norm + half-RoPE + head split) vs the unfused XLA path.

The kernel must be bit-compatible with the sequence the model otherwise runs
(reference semantics: vorta/attention/wan.py:64-101 — RMSNorm(q/k) over the
full inner dim, head split, rotary): RMSNorm in f32 rounded through the input
dtype, rotation in f32 on contiguous halves (ops/rope.apply_rope_half).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vorta_tpu.ops.prologue import fused_qk_prologue, supports_prologue
from vorta_tpu.ops.rope import apply_rope_half


def _unfused(q, k, v, gq, gk, cos, sin, num_heads, eps, qk_norm):
    def rms(x, g):
        xf = x.astype(jnp.float32)
        r = jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
        return (xf * r * g[None]).astype(x.dtype)

    if qk_norm:
        q = rms(q, gq)
        k = rms(k, gk)

    def split(x):
        b, s, _ = x.shape
        return x.reshape(b, s, num_heads, -1).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    q = apply_rope_half(q, cos, sin)
    k = apply_rope_half(k, cos, sin)
    return q, k, v


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("qk_norm", [True, False])
def test_prologue_parity(dtype, qk_norm):
    b, s, h, d = 2, 48, 3, 128
    dim = h * d
    assert supports_prologue(s, dim, h)
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kg1, kg2, kt = jax.random.split(key, 6)
    q = jax.random.normal(kq, (b, s, dim), dtype)
    k = jax.random.normal(kk, (b, s, dim), dtype)
    v = jax.random.normal(kv, (b, s, dim), dtype)
    gq = 1.0 + 0.1 * jax.random.normal(kg1, (dim,), jnp.float32)
    gk = 1.0 + 0.1 * jax.random.normal(kg2, (dim,), jnp.float32)
    ang = jax.random.uniform(kt, (s, d // 2), jnp.float32, 0, 6.28)
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    fq, fk, fv = fused_qk_prologue(
        q, k, v, gq if qk_norm else None, gk if qk_norm else None, cos, sin,
        num_heads=h, eps=1e-6, qk_norm=qk_norm, interpret=True,
    )
    uq, uk, uv = _unfused(q, k, v, gq, gk, cos, sin, h, 1e-6, qk_norm)
    assert fq.dtype == dtype and fq.shape == (b, h, s, d)
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(fq, np.float32), np.asarray(uq, np.float32), atol=tol, rtol=tol)
    np.testing.assert_allclose(np.asarray(fk, np.float32), np.asarray(uk, np.float32), atol=tol, rtol=tol)
    np.testing.assert_array_equal(np.asarray(fv, np.float32), np.asarray(uv, np.float32))


def test_supports_prologue_gates():
    assert not supports_prologue(17, 384, 3)     # s not divisible by 16
    assert not supports_prologue(64, 96, 3)      # head dim 32 < 128 lanes
    assert supports_prologue(256, 1536, 12)      # Wan 1.3B geometry


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_prologue_perhead_norm_parity(dtype):
    """norm_scope='head': per-head RMS (Hunyuan PerHeadRMSNorm semantics),
    gain (d,) tiled across heads, identity-rotation padding on text rows."""
    b, s, h, d = 1, 48, 3, 128
    dim = h * d
    video = 32  # rows >= video get (cos=1, sin=0): rotation is a no-op
    key = jax.random.PRNGKey(3)
    kq, kk, kv, kg1, kg2, kt = jax.random.split(key, 6)
    q = jax.random.normal(kq, (b, s, dim), dtype)
    k = jax.random.normal(kk, (b, s, dim), dtype)
    v = jax.random.normal(kv, (b, s, dim), dtype)
    gq = 1.0 + 0.1 * jax.random.normal(kg1, (d,), jnp.float32)
    gk = 1.0 + 0.1 * jax.random.normal(kg2, (d,), jnp.float32)
    ang = jax.random.uniform(kt, (video, d // 2), jnp.float32, 0, 6.28)
    cos = jnp.concatenate([jnp.cos(ang), jnp.ones((s - video, d // 2))])
    sin = jnp.concatenate([jnp.sin(ang), jnp.zeros((s - video, d // 2))])

    fq, fk, fv = fused_qk_prologue(
        q, k, v, jnp.tile(gq, h), jnp.tile(gk, h), cos, sin,
        num_heads=h, eps=1e-6, qk_norm=True, norm_scope="head",
        interpret=True,
    )

    def perhead_rms(x, g):
        xs = x.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        xf = xs.astype(jnp.float32)
        r = jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + 1e-6)
        return (xf * r * g[None, None, None]).astype(x.dtype)

    uq = perhead_rms(q, gq)
    uk = perhead_rms(k, gk)
    uq = jnp.concatenate(
        [apply_rope_half(uq[:, :, :video], jnp.cos(ang), jnp.sin(ang)),
         uq[:, :, video:]], axis=2)
    uk = jnp.concatenate(
        [apply_rope_half(uk[:, :, :video], jnp.cos(ang), jnp.sin(ang)),
         uk[:, :, video:]], axis=2)
    uv = v.reshape(b, s, h, d).transpose(0, 2, 1, 3)
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(fq, np.float32), np.asarray(uq, np.float32), atol=tol, rtol=tol)
    np.testing.assert_allclose(np.asarray(fk, np.float32), np.asarray(uk, np.float32), atol=tol, rtol=tol)
    np.testing.assert_array_equal(np.asarray(fv, np.float32), np.asarray(uv, np.float32))


def test_hunyuan_paths_fused_equals_unfused(monkeypatch):
    """Joint + single attention identical with the prologue fused vs off
    (per-head norm scope; single-stream identity-rotation text padding)."""
    from flax import nnx

    from vorta_tpu.config import AttentionConfig
    from vorta_tpu.models.hunyuan import (HunyuanJointAttention,
                                          HunyuanModelConfig,
                                          HunyuanSingleAttention,
                                          hunyuan_rope_tables)
    from vorta_tpu.ops.joint_experts import JointConfig

    cfg = HunyuanModelConfig(
        dim=256, num_heads=2, head_dim=128, dual_layers=1, single_layers=1,
        text_dim=48, text_len=16, pooled_dim=32, rope_axes=(16, 56, 56),
        freq_dim=32, refiner_layers=1, mlp_ratio=2.0,
    )
    grid = (2, 4, 8)  # sv=64, joint=80 — both %16==0
    attn = AttentionConfig(
        latent_shape=grid, sta_window=(3, 3, 3), sta_tile=(2, 2, 2),
        lowres_window=(2, 2, 2), block_q=16, block_kv=16,
    )
    jcfg = JointConfig(video=attn, text_len=cfg.text_len)
    sv = 64
    rope = hunyuan_rope_tables(grid, cfg)
    mask = jnp.ones((1, cfg.text_len), bool)
    kw = dict(dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0))
    joint = HunyuanJointAttention(cfg, **kw)
    single = HunyuanSingleAttention(cfg, **kw)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, sv, cfg.dim), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.text_len, cfg.dim), jnp.float32)
    xj = jnp.concatenate([x, ctx], axis=1)

    from vorta_tpu.ops import prologue as prologue_mod

    outs = {}
    for mode in ("fused", "off"):
        monkeypatch.setattr(prologue_mod, "_PROLOGUE_MODE", mode)
        outs[mode] = (
            joint(x, ctx, rope, mask, jcfg, None, "off", True),
            single(xj, sv, rope, mask, jcfg, None, "off", True),
        )
    for f, u in zip(jax.tree.leaves(outs["fused"]), jax.tree.leaves(outs["off"])):
        np.testing.assert_allclose(np.asarray(f), np.asarray(u), atol=2e-5, rtol=2e-5)


def test_model_path_fused_equals_unfused(monkeypatch):
    """WanSelfAttention output identical with the prologue fused vs env-disabled."""
    from flax import nnx

    from vorta_tpu.config import AttentionConfig
    from vorta_tpu.models.wan import WanModelConfig, WanSelfAttention

    dim, h, s, b = 256 * 1, 2, 32, 1
    # need d%128==0 -> dim = 2*128
    cfg_m = WanModelConfig(dim=dim, num_heads=h, head_dim=dim // h)
    attn = WanSelfAttention(
        cfg_m, dtype=jnp.float32, param_dtype=jnp.float32, rngs=nnx.Rngs(0)
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, dim), jnp.float32)
    ang = jax.random.uniform(jax.random.PRNGKey(2), (s, 64), jnp.float32, 0, 6.28)
    rope = (jnp.cos(ang), jnp.sin(ang))
    cfg = AttentionConfig(latent_shape=(2, 4, 4), block_q=16, block_kv=16)

    from vorta_tpu.ops import prologue as prologue_mod

    monkeypatch.setattr(prologue_mod, "_PROLOGUE_MODE", "fused")
    out_f = attn(x, rope, cfg, scores=None, routing_mode="off", interpret=True)
    monkeypatch.setattr(prologue_mod, "_PROLOGUE_MODE", "off")
    out_u = attn(x, rope, cfg, scores=None, routing_mode="off", interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_u), atol=2e-5, rtol=2e-5
    )
