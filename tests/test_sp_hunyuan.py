"""Hunyuan joint-attention sequence parallelism: sp=2 must match sp=1.

The joint video+text Ulysses choreography (models/hunyuan._sp_joint_in/out):
video q/k/v all_to_all seq<->heads, replicated text q/k/v + routing scores
sliced to local heads, text outputs all-gathered over the head axis
(reference: vorta/attention/hunyuan.py:153-187).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx
from jax import shard_map
from jax.sharding import PartitionSpec as P

from vorta_tpu.config import AttentionConfig
from vorta_tpu.models.hunyuan import HUNYUAN_TINY, HunyuanModel
from vorta_tpu.parallel.mesh import make_mesh

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
    return HunyuanModel(HUNYUAN_TINY, rngs=nnx.Rngs(0))


@pytest.fixture(scope="module")
def inputs():
    cfg = HUNYUAN_TINY
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    latents = jax.random.normal(k1, (1, 4, 8, 8, cfg.in_channels))
    text = jax.random.normal(k2, (1, cfg.text_len, cfg.text_dim))
    mask = jnp.arange(cfg.text_len)[None, :] < 17  # ragged text length
    pooled = jax.random.normal(k3, (1, cfg.pooled_dim))
    t = jnp.asarray([500.0])
    guidance = jnp.asarray([1000.0])
    return latents, t, text, mask, pooled, guidance


@pytest.mark.parametrize("mode", ["off", "hard", "soft"])
def test_sp_matches_single_device(model, inputs, mode):
    latents, t, text, mask, pooled, guidance = inputs
    ref = model(
        latents, t, text, mask, pooled, guidance=guidance,
        attn_cfg=ATTN, routing_mode=mode, interpret=True,
    ).sample

    mesh = make_mesh(sp_size=2, dp_size=1)
    graphdef, state = nnx.split(model)

    def fwd(state, latents_local, t, text, mask, pooled, guidance):
        m = nnx.merge(graphdef, state)
        out = m(
            latents_local, t, text, mask, pooled, guidance=guidance,
            attn_cfg=ATTN, routing_mode=mode, interpret=True, sp_axis="sp",
        )
        return out.sample

    f = shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P(None, "sp"), P(), P(), P(), P(), P()),
        out_specs=P(None, "sp"),
        check_vma=False,
    )
    out = f(state, latents, t, text, mask, pooled, guidance)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_sp_training_losses_match(model, inputs):
    """Hunyuan router train step under (dp=1, sp=2) matches single-device."""
    from vorta_tpu.schedulers.flow_match import train_sigmas
    from vorta_tpu.training.step import (
        LossWeights,
        make_hunyuan_router_train_step,
        make_optimizer,
        router_partition,
    )

    latents, _, text, mask, pooled, _ = inputs
    graphdef, router_state, frozen_state = router_partition(model)
    sigmas = train_sigmas(shift=5.0)
    optimizer = make_optimizer(lr=1e-2)
    opt_state = optimizer.init(router_state)
    weights = LossWeights(hidden_layer_distill=1.0)
    key = jax.random.PRNGKey(7)

    # single-device reference
    step1 = make_hunyuan_router_train_step(
        graphdef, ATTN, optimizer, weights=weights,
        timestep_table=sigmas * 1000.0, sigma_table=sigmas, interpret=True,
    )
    _, _, m_ref = step1(
        router_state, frozen_state, opt_state, latents, text, mask, pooled, key
    )

    mesh = make_mesh(sp_size=2, dp_size=1)
    step2 = make_hunyuan_router_train_step(
        graphdef, ATTN, optimizer, weights=weights,
        timestep_table=sigmas * 1000.0, sigma_table=sigmas,
        sp_axis="sp", interpret=True,
    )
    f = shard_map(
        step2, mesh=mesh,
        in_specs=(P(), P(), P(), P(None, "sp"), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    _, _, m_sp = f(
        router_state, frozen_state, opt_state, latents, text, mask, pooled, key
    )
    # reg/last losses are identical; fm/hidden differ only through the
    # rank-decorrelated noise, so compare the noise-free components tightly
    np.testing.assert_allclose(
        float(m_sp["l_reg"]), float(m_ref["l_reg"]), rtol=1e-4
    )
    assert np.isfinite(float(m_sp["loss"]))
    assert np.isfinite(float(m_sp["l_last"]))
