import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vorta_tpu.config import WAN_TINY, AttentionConfig
from vorta_tpu.models.wan import WanModel
from vorta_tpu.parallel.mesh import make_mesh
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


@pytest.mark.parametrize("mode", ["off", "hard"])
def test_sp_sampling_matches_single_device(mode):
    model = WanModel(WAN_TINY, rngs=nnx.Rngs(0))
    pipe = WanT2VPipeline(model, attn_cfg=ATTN, interpret=True)
    mesh = make_mesh(sp_size=2, dp_size=1)
    pipe_sp = WanT2VPipeline(model, attn_cfg=ATTN, interpret=True, mesh=mesh)

    latents = pipe.prepare_latents(jax.random.PRNGKey(0), 1, 13, 64, 64)
    pe = jax.random.normal(jax.random.PRNGKey(1), (1, WAN_TINY.text_len, WAN_TINY.text_dim))
    ne = jnp.zeros_like(pe)
    cfg = SamplingConfig(num_inference_steps=2, guidance_scale=5.0, routing_mode=mode)

    ref, _ = pipe(latents, pe, ne, sampling=cfg)
    out, _ = pipe_sp(latents, pe, ne, sampling=cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-4, atol=5e-4)


def test_hunyuan_sp_sampling_matches_single_device():
    from vorta_tpu.models.hunyuan import HUNYUAN_TINY, HunyuanModel
    from vorta_tpu.pipelines.hunyuan_t2v import (
        HunyuanSamplingConfig,
        HunyuanT2VPipeline,
    )

    cfg = HUNYUAN_TINY
    model = HunyuanModel(cfg, rngs=nnx.Rngs(0))
    pipe = HunyuanT2VPipeline(model, attn_cfg=ATTN, interpret=True)
    mesh = make_mesh(sp_size=2, dp_size=1)
    pipe_sp = HunyuanT2VPipeline(model, attn_cfg=ATTN, interpret=True, mesh=mesh)

    latents = pipe.prepare_latents(jax.random.PRNGKey(0), 1, 13, 64, 64)
    text = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim))
    mask = jnp.arange(cfg.text_len)[None, :] < 17
    pooled = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.pooled_dim))
    sampling = HunyuanSamplingConfig(num_inference_steps=2, routing_mode="hard")

    ref = pipe(latents, text, mask, pooled, sampling=sampling)
    out = pipe_sp(latents, text, mask, pooled, sampling=sampling)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-4, atol=5e-4)


def test_i2v_pipeline_end_to_end():
    """image_embeds threads through the pipeline (plain + SP) and changes
    the sample (reference I2V image-KV branch, wan.py:119-139)."""
    from vorta_tpu.config import WanModelConfig

    cfg = WanModelConfig(
        dim=128, ffn_dim=256, num_heads=2, head_dim=64, num_layers=2,
        text_dim=32, text_len=16, freq_dim=32, image_dim=24,
    )
    model = WanModel(cfg, rngs=nnx.Rngs(0))
    pipe = WanT2VPipeline(model, attn_cfg=ATTN, interpret=True)
    latents = pipe.prepare_latents(jax.random.PRNGKey(0), 1, 13, 64, 64)
    pe = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim))
    img = jax.random.normal(jax.random.PRNGKey(2), (1, 257, cfg.image_dim))
    sampling = SamplingConfig(num_inference_steps=2, routing_mode="hard")

    out_t2v, _ = pipe(latents, pe, sampling=sampling)
    out_i2v, _ = pipe(latents, pe, sampling=sampling, image_embeds=img)
    assert np.isfinite(np.asarray(out_i2v)).all()
    assert np.abs(np.asarray(out_i2v) - np.asarray(out_t2v)).max() > 1e-5

    mesh = make_mesh(sp_size=2, dp_size=1)
    pipe_sp = WanT2VPipeline(model, attn_cfg=ATTN, interpret=True, mesh=mesh)
    out_sp, _ = pipe_sp(latents, pe, sampling=sampling, image_embeds=img)
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out_i2v),
                               rtol=5e-4, atol=5e-4)


def test_sp_cfg_batch_matches_sequential():
    """cfg_batch under the shard_map SP loop == sequential SP CFG."""
    model = WanModel(WAN_TINY, rngs=nnx.Rngs(0))
    mesh = make_mesh(sp_size=2, dp_size=1)
    pipe_sp = WanT2VPipeline(model, attn_cfg=ATTN, interpret=True, mesh=mesh)

    latents = pipe_sp.prepare_latents(jax.random.PRNGKey(4), 1, 13, 64, 64)
    pe = jax.random.normal(jax.random.PRNGKey(1), (1, WAN_TINY.text_len, WAN_TINY.text_dim))
    ne = jax.random.normal(jax.random.PRNGKey(2), (1, WAN_TINY.text_len, WAN_TINY.text_dim))
    kw = dict(num_inference_steps=2, guidance_scale=5.0, routing_mode="hard")
    ref, _ = pipe_sp(latents, pe, ne, sampling=SamplingConfig(**kw))
    got, _ = pipe_sp(latents, pe, ne, sampling=SamplingConfig(cfg_batch=True, **kw))
    rel = float(np.linalg.norm(np.asarray(got) - np.asarray(ref))
                / np.linalg.norm(np.asarray(ref)))
    assert rel < 1e-3, rel
