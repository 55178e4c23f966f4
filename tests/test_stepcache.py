"""Step-residual caching (ops/stepcache.py + pipeline integration).

The cache is a serving-mode acceleration: a traced cond skips the DiT block
stack when the accumulated timestep-embedding distance stays under a
threshold.  Semantics pinned here:

- threshold so small nothing ever skips  ==  caching disabled (bit-exact)
- warmup covering every step             ==  caching disabled (bit-exact)
- huge threshold: skips actually happen (outputs differ, stay finite)
- unit behavior of cache_decision / rel_l1 / rescale
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vorta_tpu.config import WAN_TINY, AttentionConfig
from vorta_tpu.models.wan import WanModel
from vorta_tpu.ops.stepcache import (
    StepCache,
    cache_decision,
    init_step_cache,
    rel_l1,
    rescale,
)
from vorta_tpu.pipelines.wan_t2v import SamplingConfig, WanT2VPipeline

ATTN = AttentionConfig(
    latent_shape=(4, 4, 4),
    sta_window=(3, 3, 1),
    sta_tile=(2, 2, 2),
    lowres_window=(2, 2, 2),
    block_q=16,
    block_kv=16,
    sta_block_q=8,
    sta_block_kv=8,
)


def _setup():
    model = WanModel(WAN_TINY, rngs=nnx.Rngs(0))
    pipe = WanT2VPipeline(model, attn_cfg=ATTN, interpret=True)
    latents = pipe.prepare_latents(jax.random.PRNGKey(0), 1, 13, 64, 64)
    pe = jax.random.normal(
        jax.random.PRNGKey(1), (1, WAN_TINY.text_len, WAN_TINY.text_dim)
    )
    return pipe, latents, pe, jnp.zeros_like(pe)


def test_rel_l1_and_rescale():
    a = jnp.asarray([[1.0, 2.0, 3.0]])
    b = jnp.asarray([[1.0, 2.0, 5.0]])
    assert np.isclose(float(rel_l1(b, a)), (2.0 / 3.0) / 2.0)
    # numpy.polyval convention: highest degree first
    d = jnp.float32(2.0)
    assert np.isclose(float(rescale(d, (3.0, 1.0, -2.0))), 3 * 4 + 2 - 2)
    assert float(rescale(d, None)) == 2.0


def test_cache_decision_accumulates_and_forces():
    cache = init_step_cache(1, 8, 4, 6, jnp.float32)
    ind = jnp.ones((1, 6), jnp.float32)
    # invalid cache never skips
    skip, _ = cache_decision(cache, ind, threshold=1e9)
    assert not bool(skip)
    valid = StepCache(ind, cache.residual, jnp.zeros((), jnp.float32),
                      jnp.ones((), bool))
    # same indicator, big threshold -> skip, acc stays ~0
    skip, acc = cache_decision(valid, ind, threshold=0.5)
    assert bool(skip) and float(acc) < 1e-6
    # distance accumulates across skipped steps
    far = 2.0 * ind
    skip, acc = cache_decision(valid, far, threshold=0.5)
    assert not bool(skip) and float(acc) > 0.5
    # force_compute overrides an eligible skip
    skip, _ = cache_decision(valid, ind, threshold=0.5,
                             force_compute=jnp.ones((), bool))
    assert not bool(skip)


@pytest.mark.parametrize("mode", ["off", "hard"])
def test_never_skipping_cache_is_bit_exact(mode):
    pipe, latents, pe, ne = _setup()
    base = SamplingConfig(num_inference_steps=3, guidance_scale=5.0,
                          routing_mode=mode)
    ref, _ = pipe(latents, pe, ne, sampling=base)
    # threshold too small to ever allow a skip -> identical math
    tiny = dataclasses.replace(base, cache_threshold=1e-12)
    out, _ = pipe(latents, pe, ne, sampling=tiny)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # warmup covering every step -> identical math even at huge threshold
    warm = dataclasses.replace(base, cache_threshold=1e9, cache_warmup=3)
    out_w, _ = pipe(latents, pe, ne, sampling=warm)
    np.testing.assert_array_equal(np.asarray(out_w), np.asarray(ref))


@pytest.mark.parametrize("cfg_batch", [False, True])
def test_skipping_changes_output_and_stays_finite(cfg_batch):
    pipe, latents, pe, ne = _setup()
    base = SamplingConfig(num_inference_steps=4, guidance_scale=5.0,
                          routing_mode="hard", cfg_batch=cfg_batch)
    ref, _ = pipe(latents, pe, ne, sampling=base)
    cached = dataclasses.replace(base, cache_threshold=1e9, cache_warmup=1)
    out, _ = pipe(latents, pe, ne, sampling=cached)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    # the middle steps were skipped -> result must actually differ
    assert not np.array_equal(out, np.asarray(ref))


def test_cached_output_approximates_uncached():
    # a mild threshold should land between "identical" and "garbage":
    # relative error bounded well below the signal scale
    pipe, latents, pe, ne = _setup()
    base = SamplingConfig(num_inference_steps=6, guidance_scale=5.0,
                          routing_mode="off", scheduler="euler")
    ref, _ = pipe(latents, pe, ne, sampling=base)
    cached = dataclasses.replace(base, cache_threshold=0.15, cache_warmup=2)
    out, _ = pipe(latents, pe, ne, sampling=cached)
    ref, out = np.asarray(ref), np.asarray(out)
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-8)
    assert rel < 0.5, rel


def test_hunyuan_cache_bit_exact_and_skipping():
    from vorta_tpu.models.hunyuan import HUNYUAN_TINY, HunyuanModel
    from vorta_tpu.pipelines.hunyuan_t2v import (
        HunyuanSamplingConfig,
        HunyuanT2VPipeline,
    )

    cfg = HUNYUAN_TINY
    model = HunyuanModel(cfg, rngs=nnx.Rngs(0))
    pipe = HunyuanT2VPipeline(model, attn_cfg=ATTN, interpret=True)
    latents = pipe.prepare_latents(jax.random.PRNGKey(0), 1, 13, 64, 64)
    text = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim))
    mask = jnp.arange(cfg.text_len)[None, :] < 17
    pooled = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.pooled_dim))

    base = HunyuanSamplingConfig(num_inference_steps=3, routing_mode="hard")
    ref = pipe(latents, text, mask, pooled, sampling=base)
    never = dataclasses.replace(base, cache_threshold=1e-12)
    out = pipe(latents, text, mask, pooled, sampling=never)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    always = dataclasses.replace(base, cache_threshold=1e9, cache_warmup=1)
    out_s = pipe(latents, text, mask, pooled, sampling=always)
    out_s = np.asarray(out_s)
    assert np.isfinite(out_s).all()
    assert not np.array_equal(out_s, np.asarray(ref))


def test_model_level_cache_rejects_training_modes():
    model = WanModel(WAN_TINY, rngs=nnx.Rngs(0))
    lat = jnp.zeros((1, 4, 8, 8, WAN_TINY.in_channels))
    ctx = jnp.zeros((1, WAN_TINY.text_len, WAN_TINY.text_dim))
    cache = init_step_cache(1, 4 * 4 * 4, WAN_TINY.dim, 6 * WAN_TINY.dim,
                            jnp.float32)
    with pytest.raises(ValueError, match="serving mode"):
        model(lat, jnp.zeros((1,)), ctx, attn_cfg=ATTN, routing_mode="hard",
              return_losses=True, interpret=True, step_cache=cache,
              cache_threshold=0.1)


@pytest.mark.parametrize("threshold,warmup", [(1e-12, 1), (1e9, 1)])
def test_sp_cached_sampling_matches_single_device(threshold, warmup):
    # the cache carry (residual sharded over sp, skip decision replicated)
    # must reproduce the single-device cached trajectory exactly — both in
    # the never-skip regime and with real skips happening
    from vorta_tpu.parallel.mesh import make_mesh

    pipe, latents, pe, ne = _setup()
    mesh = make_mesh(sp_size=2, dp_size=1)
    pipe_sp = WanT2VPipeline(pipe.model, attn_cfg=ATTN, interpret=True,
                             mesh=mesh)
    cfg = SamplingConfig(num_inference_steps=4, guidance_scale=5.0,
                         routing_mode="hard", cache_threshold=threshold,
                         cache_warmup=warmup)
    ref, _ = pipe(latents, pe, ne, sampling=cfg)
    out, _ = pipe_sp(latents, pe, ne, sampling=cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)
    if threshold > 1.0:
        # skips must actually have happened in both
        base = dataclasses.replace(cfg, cache_threshold=0.0)
        plain, _ = pipe(latents, pe, ne, sampling=base)
        assert not np.array_equal(np.asarray(out), np.asarray(plain))


def test_hunyuan_sp_cached_sampling_matches_single_device():
    from vorta_tpu.models.hunyuan import HUNYUAN_TINY, HunyuanModel
    from vorta_tpu.parallel.mesh import make_mesh
    from vorta_tpu.pipelines.hunyuan_t2v import (
        HunyuanSamplingConfig,
        HunyuanT2VPipeline,
    )

    cfg = HUNYUAN_TINY
    model = HunyuanModel(cfg, rngs=nnx.Rngs(0))
    pipe = HunyuanT2VPipeline(model, attn_cfg=ATTN, interpret=True)
    mesh = make_mesh(sp_size=2, dp_size=1)
    pipe_sp = HunyuanT2VPipeline(model, attn_cfg=ATTN, interpret=True,
                                 mesh=mesh)
    latents = pipe.prepare_latents(jax.random.PRNGKey(0), 1, 13, 64, 64)
    text = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim))
    mask = jnp.arange(cfg.text_len)[None, :] < 17
    pooled = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.pooled_dim))
    sampling = HunyuanSamplingConfig(num_inference_steps=4, routing_mode="hard",
                                     cache_threshold=1e9, cache_warmup=1)
    ref = pipe(latents, text, mask, pooled, sampling=sampling)
    out = pipe_sp(latents, text, mask, pooled, sampling=sampling)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


def test_hidden_delta_probe_matches_cached_residual():
    # tools/fit_cache_poly.py fits on (indicator, hidden_delta) pairs; the
    # delta it records must be exactly the residual the cache would replay
    model = WanModel(WAN_TINY, rngs=nnx.Rngs(0))
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, WAN_TINY.in_channels))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, WAN_TINY.text_len, WAN_TINY.text_dim))
    t = jnp.full((1,), 500.0)
    probe = model(lat, t, ctx, attn_cfg=ATTN, routing_mode="hard",
                  interpret=True, return_hidden_delta=True)
    assert probe.temb_indicator.shape == (1, 6 * WAN_TINY.dim)
    cache = init_step_cache(1, 4 * 4 * 4, WAN_TINY.dim, 6 * WAN_TINY.dim,
                            jnp.float32)
    out = model(lat, t, ctx, attn_cfg=ATTN, routing_mode="hard",
                interpret=True, step_cache=cache, cache_threshold=0.1)
    np.testing.assert_allclose(
        np.asarray(out.step_cache.residual), np.asarray(probe.hidden_delta),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out.step_cache.prev_ind), np.asarray(probe.temb_indicator),
        rtol=1e-6, atol=0,
    )
