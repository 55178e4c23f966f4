"""Dynamic W8A8 serving mode (ops/qmm): default-off, close when on."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from vorta_tpu.ops.qmm import QLinear, int8_linear, mm_precision


def test_int8_linear_close_to_f32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 96)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((96, 128)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((128,)) * 0.1, jnp.float32)
    ref = x @ w + b
    got = int8_linear(x, w, b)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_qlinear_default_is_exact_linear():
    lin = nnx.Linear(32, 48, rngs=nnx.Rngs(0))
    qlin = QLinear(32, 48, rngs=nnx.Rngs(0))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((8, 32)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(lin(x)), np.asarray(qlin(x)))
    # param trees identical -> importers/checkpoints unaffected
    keys = lambda m: {k for k, _ in nnx.to_flat_state(nnx.split(m)[1])}
    assert keys(lin) == keys(qlin)


def test_qlinear_context_switches_path():
    qlin = QLinear(32, 48, rngs=nnx.Rngs(0))
    x = jnp.asarray(np.random.default_rng(2).standard_normal((8, 32)), jnp.float32)
    ref = qlin(x)
    with mm_precision("int8"):
        got = qlin(x)
    assert not np.array_equal(np.asarray(got), np.asarray(ref))
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel


def test_wan_model_int8_mode_close():
    from vorta_tpu.config import AttentionConfig, WanModelConfig
    from vorta_tpu.models.wan import WanModel

    cfg = WanModelConfig(
        dim=64, ffn_dim=128, num_heads=2, head_dim=32, num_layers=1,
        text_len=8, text_dim=32, freq_dim=32,
    )
    model = WanModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32,
                     rngs=nnx.Rngs(0))
    attn = AttentionConfig(latent_shape=(2, 4, 4), sta_tile=(2, 4, 4))
    lat = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 2, 8, 8, cfg.in_channels)),
        jnp.float32)
    ctx = jnp.asarray(
        np.random.default_rng(4).standard_normal((1, 8, 32)), jnp.float32)
    t = jnp.full((1,), 500.0)
    ref = model(lat, t, ctx, attn_cfg=attn, interpret=True).sample
    got = model(lat, t, ctx, attn_cfg=attn, interpret=True,
                mm_precision="int8").sample
    assert not np.array_equal(np.asarray(got), np.asarray(ref))
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.05, rel
