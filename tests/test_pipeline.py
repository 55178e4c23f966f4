import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vorta_tpu.config import WAN_TINY, AttentionConfig
from vorta_tpu.models.wan import WanModel
from vorta_tpu.pipelines.wan_t2v import SamplingConfig, WanT2VPipeline
from vorta_tpu.schedulers.flow_match import FlowMatchEulerSchedule, time_shift

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


def test_schedule_matches_diffusers_formula():
    sched = FlowMatchEulerSchedule.create(10, shift=5.0)
    assert sched.sigmas.shape == (11,)
    assert sched.sigmas[-1] == 0.0
    # first sigma: t=1000 -> sigma=1 -> shifted still 1
    np.testing.assert_allclose(sched.sigmas[0], 1.0, rtol=1e-6)
    # monotonically decreasing
    assert np.all(np.diff(sched.sigmas) < 0)
    # timesteps = 1000 * shifted sigma
    np.testing.assert_allclose(sched.timesteps, sched.sigmas[:-1] * 1000, rtol=1e-6)
    # shift formula
    np.testing.assert_allclose(time_shift(np.asarray([0.5]), 5.0), [5 * 0.5 / 3.0])


def test_euler_step_reaches_x0_for_exact_velocity():
    # if the model predicted v = eps - x0 exactly, integrating from x_1 = eps
    # over the full schedule lands on x0
    sched = FlowMatchEulerSchedule.create(25, shift=3.0)
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((4, 4)).astype(np.float32)
    eps = rng.standard_normal((4, 4)).astype(np.float32)
    x = eps.copy()
    v = eps - x0
    for i in range(sched.num_steps):
        x = sched.step(x, v, i)
    np.testing.assert_allclose(x, x0, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def model():
    return WanModel(WAN_TINY, rngs=nnx.Rngs(0))


def test_pipeline_end_to_end(model):
    pipe = WanT2VPipeline(model, attn_cfg=ATTN, interpret=True)
    key = jax.random.PRNGKey(0)
    latents = pipe.prepare_latents(key, batch=1, frames=13, height=64, width=64)
    assert latents.shape == (1, 4, 8, 8, WAN_TINY.in_channels)
    pe = jax.random.normal(jax.random.PRNGKey(1), (1, WAN_TINY.text_len, WAN_TINY.text_dim))
    ne = jnp.zeros_like(pe)
    out, _ = pipe(
        latents, pe, ne,
        sampling=SamplingConfig(num_inference_steps=2, guidance_scale=5.0, routing_mode="off"),
    )
    assert out.shape == latents.shape
    assert np.isfinite(np.asarray(out)).all()


def test_pipeline_routed_with_scores(model):
    pipe = WanT2VPipeline(model, attn_cfg=ATTN, interpret=True)
    latents = pipe.prepare_latents(jax.random.PRNGKey(0), 1, 13, 64, 64)
    pe = jax.random.normal(jax.random.PRNGKey(1), (1, WAN_TINY.text_len, WAN_TINY.text_dim))
    out, scores = pipe(
        latents, pe, None,
        sampling=SamplingConfig(
            num_inference_steps=2, guidance_scale=1.0,
            routing_mode="hard", return_scores=True,
        ),
    )
    assert np.isfinite(np.asarray(out)).all()
    # (steps, layers, B, H, experts)
    assert scores.shape == (2, WAN_TINY.num_layers, 1, WAN_TINY.num_heads, 3)


def test_pipeline_deterministic(model):
    pipe = WanT2VPipeline(model, attn_cfg=ATTN, interpret=True)
    latents = pipe.prepare_latents(jax.random.PRNGKey(7), 1, 13, 64, 64)
    pe = jax.random.normal(jax.random.PRNGKey(1), (1, WAN_TINY.text_len, WAN_TINY.text_dim))
    cfg = SamplingConfig(num_inference_steps=2, guidance_scale=1.0)
    out1, _ = pipe(latents, pe, None, sampling=cfg)
    out2, _ = pipe(latents, pe, None, sampling=cfg)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_pipeline_int8_serving_mode(model):
    """mm_precision=int8 runs end-to-end and stays close to bf16."""
    pipe = WanT2VPipeline(model, attn_cfg=ATTN, interpret=True)
    latents = pipe.prepare_latents(jax.random.PRNGKey(3), 1, 13, 64, 64)
    pe = jax.random.normal(jax.random.PRNGKey(1), (1, WAN_TINY.text_len, WAN_TINY.text_dim))
    kw = dict(num_inference_steps=2, guidance_scale=1.0, routing_mode="hard")
    ref, _ = pipe(latents, pe, None, sampling=SamplingConfig(**kw))
    got, _ = pipe(latents, pe, None,
                  sampling=SamplingConfig(mm_precision="int8", **kw))
    assert np.isfinite(np.asarray(got)).all()
    assert not np.array_equal(np.asarray(got), np.asarray(ref))
    rel = float(np.linalg.norm(np.asarray(got) - np.asarray(ref))
                / np.linalg.norm(np.asarray(ref)))
    assert rel < 0.1, rel


def test_pipeline_static_int8_scales(model):
    """act_scales= threads calibrated static scales through the denoise loop."""
    latents_key = jax.random.PRNGKey(3)
    pe = jax.random.normal(jax.random.PRNGKey(1), (1, WAN_TINY.text_len, WAN_TINY.text_dim))
    kw = dict(num_inference_steps=2, guidance_scale=1.0, routing_mode="hard")

    # calibrate on one model forward at the pipeline geometry
    pipe0 = WanT2VPipeline(model, attn_cfg=ATTN, interpret=True)
    latents = pipe0.prepare_latents(latents_key, 1, 13, 64, 64)
    cal = model(
        latents.astype(model.dtype), jnp.full((1,), 500.0), pe,
        attn_cfg=ATTN, routing_mode="hard", interpret=True, calibrate_mm=True,
    ).mm_calibration
    scales = {k: np.asarray(v) / 127.0 for k, v in cal.items()}

    ref, _ = pipe0(latents, pe, None, sampling=SamplingConfig(**kw))
    pipe = WanT2VPipeline(model, attn_cfg=ATTN, interpret=True, act_scales=scales)
    got, _ = pipe(latents, pe, None,
                  sampling=SamplingConfig(mm_precision="int8", **kw))
    assert np.isfinite(np.asarray(got)).all()
    rel = float(np.linalg.norm(np.asarray(got) - np.asarray(ref))
                / np.linalg.norm(np.asarray(ref)))
    assert rel < 0.1, rel


def test_cfg_batch_matches_sequential(model):
    """cfg_batch=True (one batch-2 forward) == two sequential CFG forwards."""
    pipe = WanT2VPipeline(model, attn_cfg=ATTN, interpret=True)
    latents = pipe.prepare_latents(jax.random.PRNGKey(5), 1, 13, 64, 64)
    pe = jax.random.normal(jax.random.PRNGKey(1), (1, WAN_TINY.text_len, WAN_TINY.text_dim))
    ne = jax.random.normal(jax.random.PRNGKey(2), (1, WAN_TINY.text_len, WAN_TINY.text_dim))
    kw = dict(num_inference_steps=2, guidance_scale=5.0, routing_mode="hard")
    ref, _ = pipe(latents, pe, ne, sampling=SamplingConfig(**kw))
    got, _ = pipe(latents, pe, ne, sampling=SamplingConfig(cfg_batch=True, **kw))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)
    rel = float(np.linalg.norm(np.asarray(got) - np.asarray(ref))
                / np.linalg.norm(np.asarray(ref)))
    assert rel < 1e-3, rel
