import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vorta_tpu.config import AttentionConfig
from vorta_tpu.models.hunyuan import HUNYUAN_TINY, HunyuanModel

ATTN = AttentionConfig(
    latent_shape=(4, 4, 8),
    sta_window=(3, 3, 3),
    sta_tile=(2, 2, 2),
    lowres_window=(2, 2, 2),
    block_q=32,
    block_kv=32,
)
CFG = HUNYUAN_TINY


@pytest.fixture(scope="module")
def model():
    return HunyuanModel(CFG, rngs=nnx.Rngs(0))


@pytest.fixture(scope="module")
def inputs():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    latents = jax.random.normal(ks[0], (1, 4, 8, 16, CFG.in_channels))
    text = jax.random.normal(ks[1], (1, CFG.text_len, CFG.text_dim))
    pooled = jax.random.normal(ks[2], (1, CFG.pooled_dim))
    mask = jnp.arange(CFG.text_len) < 17
    return latents, jnp.asarray([500.0]), text, jnp.broadcast_to(mask[None], (1, CFG.text_len)), pooled


def test_forward_off(model, inputs):
    latents, t, text, mask, pooled = inputs
    out = model(
        latents, t, text, mask, pooled, guidance=jnp.asarray([6000.0]),
        attn_cfg=ATTN, routing_mode="off", interpret=True,
    )
    assert out.sample.shape == latents.shape
    assert np.isfinite(np.asarray(out.sample)).all()


def test_forward_hard_routes(model, inputs):
    latents, t, text, mask, pooled = inputs
    out = model(
        latents, t, text, mask, pooled, guidance=jnp.asarray([6000.0]),
        attn_cfg=ATTN, routing_mode="hard", return_scores=True, interpret=True,
    )
    assert np.isfinite(np.asarray(out.sample)).all()
    n_layers = CFG.dual_layers + CFG.single_layers
    assert out.routing_scores.shape == (n_layers, 1, CFG.num_heads, 3)
    np.testing.assert_allclose(np.asarray(out.routing_scores).sum(-1), 1.0, rtol=1e-5)


def test_soft_losses_and_router_grads(model, inputs):
    latents, t, text, mask, pooled = inputs

    def loss_fn(m):
        out = m(
            latents, t, text, mask, pooled, guidance=jnp.asarray([6000.0]),
            attn_cfg=ATTN, routing_mode="soft", return_losses=True, interpret=True,
        )
        assert out.reg_loss is not None
        return (
            jnp.mean(out.sample.astype(jnp.float32) ** 2)
            + out.reg_loss + out.last_layer_distill_loss
        )

    grads = nnx.grad(loss_fn)(model)
    dual_router = grads["dual_blocks"]["router"]["linear"]["kernel"][...]
    single_router = grads["single_blocks"]["router"]["linear"]["kernel"][...]
    assert np.abs(np.asarray(dual_router)).max() > 0
    assert np.abs(np.asarray(single_router)).max() > 0
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))


def test_guidance_changes_output(model, inputs):
    latents, t, text, mask, pooled = inputs
    o1 = model(latents, t, text, mask, pooled, guidance=jnp.asarray([1000.0]),
               attn_cfg=ATTN, routing_mode="off", interpret=True).sample
    o2 = model(latents, t, text, mask, pooled, guidance=jnp.asarray([6000.0]),
               attn_cfg=ATTN, routing_mode="off", interpret=True).sample
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-5


def test_hunyuan_pipeline_end_to_end(model, inputs):
    from vorta_tpu.pipelines.hunyuan_t2v import HunyuanSamplingConfig, HunyuanT2VPipeline

    latents, t, text, mask, pooled = inputs
    pipe = HunyuanT2VPipeline(model, attn_cfg=ATTN, interpret=True)
    noise = pipe.prepare_latents(jax.random.PRNGKey(0), 1, 13, 64, 128)
    assert noise.shape == latents.shape
    out = pipe(
        noise, text, mask, pooled,
        sampling=HunyuanSamplingConfig(num_inference_steps=2, routing_mode="hard"),
    )
    assert out.shape == latents.shape
    assert np.isfinite(np.asarray(out)).all()


def test_hunyuan_cfg_batch_matches_sequential(model, inputs):
    from vorta_tpu.pipelines.hunyuan_t2v import HunyuanSamplingConfig, HunyuanT2VPipeline

    latents, t, text, mask, pooled = inputs
    pipe = HunyuanT2VPipeline(model, attn_cfg=ATTN, interpret=True)
    noise = pipe.prepare_latents(jax.random.PRNGKey(2), 1, 13, 64, 128)
    neg = jax.random.normal(jax.random.PRNGKey(3), text.shape)
    kw = dict(num_inference_steps=2, routing_mode="hard", true_cfg_scale=3.0)
    ref = pipe(noise, text, mask, pooled, neg, sampling=HunyuanSamplingConfig(**kw))
    got = pipe(noise, text, mask, pooled, neg,
               sampling=HunyuanSamplingConfig(cfg_batch=True, **kw))
    rel = float(np.linalg.norm(np.asarray(got) - np.asarray(ref))
                / np.linalg.norm(np.asarray(ref)))
    assert rel < 1e-3, rel
