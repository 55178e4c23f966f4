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


def test_fused_linear_matches_separate_all_precisions():
    import jax
    from flax import nnx
    from vorta_tpu.ops.qmm import QLinear, fused_linear, mm_precision

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(4, 10, 32)), jnp.float32)
    ls = [
        QLinear(32, n, site=s, rngs=nnx.Rngs(i))
        for i, (n, s) in enumerate([(16, "a.q"), (16, "a.k"), (24, None)])
    ]
    want = [l(x) for l in ls]
    got = fused_linear(x, ls)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6, atol=1e-6)

    with mm_precision("int8"):
        want8 = [l(x) for l in ls]
        got8 = fused_linear(x, ls)
    # identical x_scale (same input) and per-channel w scales -> identical
    for w, g in zip(want8, got8):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6, atol=1e-6)

    # static scales: fused uses the max over named sites
    from vorta_tpu.ops.qmm import layer_act_scales

    scales = {"a.q": jnp.asarray(0.01), "a.k": jnp.asarray(0.02)}
    with mm_precision("int8"), layer_act_scales(scales):
        got_s = fused_linear(x, ls)
    from vorta_tpu.ops.qmm import int8_linear

    wcat = jnp.concatenate([l.kernel.value for l in ls], axis=1)
    bcat = jnp.concatenate([l.bias.value for l in ls])
    ref_s = int8_linear(x, wcat, bcat, x_scale=jnp.asarray(0.02))
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(got_s, -1)), np.asarray(ref_s), rtol=1e-6
    )

    # calibration: every named site records the shared amax
    from vorta_tpu.ops.qmm import calibration_scope

    with calibration_scope() as sink:
        fused_linear(x, ls)
    assert set(sink) == {"a.q", "a.k"}
    np.testing.assert_allclose(
        float(sink["a.q"]), float(jnp.max(jnp.abs(x))), rtol=1e-6
    )
