"""Static-scale int8 serving mode (ops/qmm.py).

Flow under test: calibrate_mm=True collects per-(site, layer) activation
amaxes through the block scan; act_scales= threads the derived scales back
so QLinear quantizes with static per-tensor scales (no amax pass).
"""

import jax.numpy as jnp
import numpy as np
from flax import nnx

from vorta_tpu.config import WanModelConfig
from vorta_tpu.models.wan import WanModel
from vorta_tpu.ops.qmm import int8_linear

CFG = WanModelConfig(
    dim=64, ffn_dim=128, num_heads=2, head_dim=32, num_layers=2,
    text_dim=16, text_len=8, freq_dim=16, in_channels=4, out_channels=4,
)
WAN_SITES = {
    "attn1.to_q", "attn1.to_k", "attn1.to_v", "attn1.to_out",
    "attn2.to_q", "attn2.to_out", "ffn.proj_in", "ffn.proj_out",
}


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    lat = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 4)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(1, 8, 16)), jnp.float32)
    ts = jnp.asarray([400.0])
    return lat, ts, ctx


def test_int8_linear_static_matches_dynamic_at_given_scale():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(32, 24)), jnp.float32)
    # static scale == each row's own amax/127 would equal per-token dynamic
    # only for rows at the global amax; instead compare against an explicit
    # requantization oracle
    s = jnp.max(jnp.abs(x)) / 127.0
    got = int8_linear(x, w, x_scale=s)
    xq = np.clip(np.round(np.asarray(x) / float(s)), -127, 127)
    wmax = np.abs(np.asarray(w)).max(axis=0, keepdims=True)
    wq = np.clip(np.round(np.asarray(w) / (wmax / 127.0)), -127, 127)
    want = (xq @ wq) * float(s) * (wmax[0] / 127.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_calibration_collects_per_layer_amax():
    model = WanModel(CFG, rngs=nnx.Rngs(0))
    lat, ts, ctx = make_inputs()
    out = model(lat, ts, ctx, routing_mode="off", interpret=True,
                calibrate_mm=True)
    assert out.mm_calibration is not None
    assert set(out.mm_calibration) == WAN_SITES
    for site, v in out.mm_calibration.items():
        v = np.asarray(v)
        assert v.shape == (CFG.num_layers,), site
        assert (v > 0).all(), site
    # layers see different activations -> amaxes differ
    any_site = np.asarray(out.mm_calibration["ffn.proj_in"])
    assert abs(any_site[0] - any_site[1]) > 0

    # calibration must not change the forward itself
    out_plain = model(lat, ts, ctx, routing_mode="off", interpret=True)
    np.testing.assert_allclose(
        np.asarray(out.sample), np.asarray(out_plain.sample), rtol=1e-6
    )


def test_static_int8_serving_close_to_bf16_and_uses_scales():
    model = WanModel(CFG, rngs=nnx.Rngs(0))
    lat, ts, ctx = make_inputs()
    ref = np.asarray(
        model(lat, ts, ctx, routing_mode="off", interpret=True).sample
    )
    amax = model(
        lat, ts, ctx, routing_mode="off", interpret=True, calibrate_mm=True
    ).mm_calibration
    scales = {k: np.asarray(v) / 127.0 for k, v in amax.items()}

    out_static = np.asarray(
        model(lat, ts, ctx, routing_mode="off", interpret=True,
              mm_precision="int8", act_scales=scales).sample
    )
    out_dyn = np.asarray(
        model(lat, ts, ctx, routing_mode="off", interpret=True,
              mm_precision="int8").sample
    )
    denom = np.abs(ref).mean()
    assert np.abs(out_static - ref).mean() / denom < 0.05
    assert np.abs(out_dyn - ref).mean() / denom < 0.05
    # static and dynamic quantize differently -> outputs must not be identical
    assert np.abs(out_static - out_dyn).max() > 0

    # garbage scales must visibly change the output (proves the table is used)
    bad = {k: v * 1e-3 for k, v in scales.items()}
    out_bad = np.asarray(
        model(lat, ts, ctx, routing_mode="off", interpret=True,
              mm_precision="int8", act_scales=bad).sample
    )
    assert np.abs(out_bad - ref).mean() / denom > 0.05


HUNYUAN_SITES = {
    "dual.attn.to_q", "dual.attn.to_k", "dual.attn.to_v", "dual.attn.to_out",
    "dual.ff.proj_in", "dual.ff.proj_out",
    "single.attn.to_q", "single.attn.to_k", "single.attn.to_v",
    "single.proj_mlp", "single.proj_out",
}


def test_hunyuan_calibrate_then_static():
    import jax

    from vorta_tpu.config import AttentionConfig
    from vorta_tpu.models.hunyuan import HUNYUAN_TINY, HunyuanModel

    cfg = HUNYUAN_TINY
    attn = AttentionConfig(
        latent_shape=(4, 4, 8), sta_window=(3, 3, 3), sta_tile=(2, 2, 2),
        lowres_window=(2, 2, 2), block_q=32, block_kv=32,
    )
    model = HunyuanModel(cfg, rngs=nnx.Rngs(0))
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    latents = jax.random.normal(ks[0], (1, 4, 8, 16, cfg.in_channels))
    text = jax.random.normal(ks[1], (1, cfg.text_len, cfg.text_dim))
    pooled = jax.random.normal(ks[2], (1, cfg.pooled_dim))
    mask = jnp.broadcast_to((jnp.arange(cfg.text_len) < 17)[None], (1, cfg.text_len))
    args = (latents, jnp.asarray([500.0]), text, mask, pooled)
    kw = dict(guidance=jnp.asarray([6000.0]), attn_cfg=attn,
              routing_mode="off", interpret=True)

    out_cal = model(*args, **kw, calibrate_mm=True)
    assert set(out_cal.mm_calibration) == HUNYUAN_SITES
    for site, v in out_cal.mm_calibration.items():
        n = cfg.dual_layers if site.startswith("dual.") else cfg.single_layers
        assert np.asarray(v).shape == (n,), site
        assert (np.asarray(v) > 0).all(), site

    scales = {k: np.asarray(v) / 127.0 for k, v in out_cal.mm_calibration.items()}
    ref = np.asarray(model(*args, **kw).sample)
    got = np.asarray(
        model(*args, **kw, mm_precision="int8", act_scales=scales).sample
    )
    assert np.isfinite(got).all()
    assert np.abs(got - ref).mean() / np.abs(ref).mean() < 0.05
