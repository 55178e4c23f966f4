import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vorta_tpu.config import WAN_TINY, AttentionConfig
from vorta_tpu.models.wan import WanModel

# token grid (4, 4, 4) -> pixels (4, 8, 8) with patch (1, 2, 2)
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


@pytest.fixture(scope="module")
def model():
    return WanModel(WAN_TINY, rngs=nnx.Rngs(0))


@pytest.fixture(scope="module")
def inputs():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    latents = jax.random.normal(k1, (1, 4, 8, 8, WAN_TINY.in_channels))
    context = jax.random.normal(k2, (1, WAN_TINY.text_len, WAN_TINY.text_dim))
    timestep = jnp.asarray([500.0])
    return latents, timestep, context


def test_forward_shapes(model, inputs):
    latents, t, ctx = inputs
    out = model(latents, t, ctx, attn_cfg=ATTN, routing_mode="off", interpret=True)
    assert out.sample.shape == latents.shape
    assert np.isfinite(np.asarray(out.sample)).all()
    assert out.reg_loss is None


def test_hard_tau1_equals_full(model, inputs):
    # tau_sparse=1.0 forces every head to the full expert -> identical to off
    latents, t, ctx = inputs
    cfg_tau1 = AttentionConfig(**{**ATTN.__dict__, "tau_sparse": 1.0})
    out_off = model(latents, t, ctx, attn_cfg=ATTN, routing_mode="off", interpret=True)
    out_hard = model(latents, t, ctx, attn_cfg=cfg_tau1, routing_mode="hard", interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_off.sample), np.asarray(out_hard.sample), rtol=1e-5, atol=1e-5
    )


def test_soft_routing_and_losses(model, inputs):
    latents, t, ctx = inputs
    out = model(
        latents, t, ctx, attn_cfg=ATTN, routing_mode="soft",
        return_losses=True, return_scores=True, interpret=True,
    )
    assert out.sample.shape == latents.shape
    for name in ("reg_loss", "last_layer_distill_loss", "hidden_layer_distill_loss"):
        val = getattr(out, name)
        assert val is not None and np.isfinite(float(val)), name
    # routing scores: (layers, B, H, experts), rows sum to 1
    assert out.routing_scores.shape == (WAN_TINY.num_layers, 1, WAN_TINY.num_heads, 3)
    np.testing.assert_allclose(np.asarray(out.routing_scores).sum(-1), 1.0, rtol=1e-5)


def test_router_grads_only_through_soft_path(model, inputs):
    latents, t, ctx = inputs

    def loss_fn(m):
        out = m(latents, t, ctx, attn_cfg=ATTN, routing_mode="soft",
                return_losses=True, interpret=True)
        return (
            jnp.mean(out.sample.astype(jnp.float32) ** 2)
            + out.reg_loss
            + out.last_layer_distill_loss
        )

    grads = nnx.grad(loss_fn)(model)
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # router grads specifically must be nonzero
    router_grad = grads["blocks"]["router"]["linear"]["kernel"][...]
    assert np.abs(np.asarray(router_grad)).max() > 0


def test_timestep_changes_routing(model, inputs):
    latents, _, ctx = inputs
    s1 = model(latents, jnp.asarray([100.0]), ctx, attn_cfg=ATTN,
               routing_mode="soft", return_scores=True, interpret=True).routing_scores
    s2 = model(latents, jnp.asarray([900.0]), ctx, attn_cfg=ATTN,
               routing_mode="soft", return_scores=True, interpret=True).routing_scores
    assert np.abs(np.asarray(s1) - np.asarray(s2)).max() > 1e-6


def test_i2v_image_conditioning():
    from vorta_tpu.config import WanModelConfig

    cfg = WanModelConfig(
        dim=128, ffn_dim=256, num_heads=2, head_dim=64, num_layers=2,
        text_dim=32, text_len=16, freq_dim=32, image_dim=24,
    )
    m = WanModel(cfg, rngs=nnx.Rngs(0))
    latents = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, cfg.in_channels))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim))
    img = jax.random.normal(jax.random.PRNGKey(2), (1, 257, cfg.image_dim))
    t = jnp.asarray([500.0])
    out_t2v = m(latents, t, ctx, attn_cfg=ATTN, routing_mode="off", interpret=True).sample
    out_i2v = m(latents, t, ctx, attn_cfg=ATTN, routing_mode="off", interpret=True,
                image_context=img).sample
    assert np.isfinite(np.asarray(out_i2v)).all()
    # image conditioning must change the output through the cross-attn branch
    assert np.abs(np.asarray(out_i2v) - np.asarray(out_t2v)).max() > 1e-5
