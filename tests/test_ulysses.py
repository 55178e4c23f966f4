"""Sequence-parallel equivalence: sp=N output must match single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx
from jax.sharding import PartitionSpec as P
from jax import shard_map

from vorta_tpu.config import WAN_TINY, AttentionConfig
from vorta_tpu.models.wan import WanModel
from vorta_tpu.parallel.mesh import make_mesh
from vorta_tpu.parallel.ulysses import (
    all_to_all_heads_to_seq,
    all_to_all_seq_to_heads,
)

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


def test_all_to_all_roundtrip_and_order():
    mesh = make_mesh(sp_size=4, dp_size=1)
    b, h, s, d = 1, 4, 16, 2
    x = jnp.arange(b * h * s * d, dtype=jnp.float32).reshape(b, h, s, d)

    def inner(x_local):
        y = all_to_all_heads_to_seq(x_local)  # (B, H/P, S, D)
        back = all_to_all_seq_to_heads(y)
        return y, back

    f = shard_map(
        inner, mesh=mesh,
        in_specs=P(None, None, "sp", None),
        out_specs=(P(None, "sp", None, None), P(None, None, "sp", None)),
    )
    y, back = f(x)
    # roundtrip is identity
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # gathered sequence is in global raster order: head-sharded view of y
    # equals the unsharded x
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


@pytest.fixture(scope="module")
def model():
    return WanModel(WAN_TINY, rngs=nnx.Rngs(0))


@pytest.fixture(scope="module")
def inputs():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    latents = jax.random.normal(k1, (1, 4, 8, 8, WAN_TINY.in_channels))
    context = jax.random.normal(k2, (1, WAN_TINY.text_len, WAN_TINY.text_dim))
    return latents, jnp.asarray([500.0]), context


@pytest.mark.parametrize("sp,mode", [(2, "off"), (2, "hard"), (2, "soft")])
def test_sp_matches_single_device(model, inputs, sp, mode):
    latents, t, ctx = inputs
    ref = model(latents, t, ctx, attn_cfg=ATTN, routing_mode=mode, interpret=True).sample

    mesh = make_mesh(sp_size=sp, dp_size=1)
    graphdef, state = nnx.split(model)

    def fwd(state, latents_local, t, ctx):
        m = nnx.merge(graphdef, state)
        out = m(
            latents_local, t, ctx, attn_cfg=ATTN, routing_mode=mode,
            interpret=True, sp_axis="sp",
        )
        return out.sample

    f = shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P(None, "sp", None, None, None), P(), P()),
        out_specs=P(None, "sp", None, None, None),
        check_vma=False,

    )
    out = f(state, latents, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_sp_training_losses_match(model, inputs):
    latents, t, ctx = inputs
    ref = model(
        latents, t, ctx, attn_cfg=ATTN, routing_mode="soft",
        return_losses=True, interpret=True,
    )

    mesh = make_mesh(sp_size=2, dp_size=1)
    graphdef, state = nnx.split(model)

    def fwd(state, latents_local, t, ctx):
        m = nnx.merge(graphdef, state)
        out = m(
            latents_local, t, ctx, attn_cfg=ATTN, routing_mode="soft",
            return_losses=True, interpret=True, sp_axis="sp",
        )
        # per-rank hidden/last losses are means over the local shard; average
        # over the sp group reproduces the global mean
        last = jax.lax.pmean(out.last_layer_distill_loss, "sp")
        hidden = jax.lax.pmean(out.hidden_layer_distill_loss, "sp")
        return out.sample, out.reg_loss, last, hidden

    f = shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P(None, "sp", None, None, None), P(), P()),
        out_specs=(P(None, "sp", None, None, None), P(), P(), P()),
        check_vma=False,

    )
    sample, reg, last, hidden = f(state, latents, t, ctx)
    np.testing.assert_allclose(float(reg), float(ref.reg_loss), rtol=1e-4)
    np.testing.assert_allclose(float(last), float(ref.last_layer_distill_loss), rtol=1e-3)
    np.testing.assert_allclose(float(hidden), float(ref.hidden_layer_distill_loss), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(sample), np.asarray(ref.sample), rtol=2e-4, atol=2e-4)
