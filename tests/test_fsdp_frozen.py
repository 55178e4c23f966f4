"""FSDP-style layer-sharded frozen params: sharded == replicated.

The fallback for DiTs whose frozen weights do not fit replicated (reference:
FSDP wrap of the frozen 13-14B model, train/fsdp_utils.py): stacked block
params shard over the dp axis on the layer dimension; the block loop fetches
one block per step with a psum broadcast (models/wan.py frozen_sharded_axis).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from vorta_tpu.config import WAN_TINY, AttentionConfig
from vorta_tpu.models.wan import WanModel
from vorta_tpu.parallel.mesh import make_mesh
from vorta_tpu.schedulers.flow_match import train_sigmas
from vorta_tpu.training.step import (
    LossWeights,
    frozen_sharding_specs,
    make_optimizer,
    make_router_train_step,
    router_partition,
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


def test_frozen_sharding_specs_shape():
    model = WanModel(WAN_TINY, rngs=nnx.Rngs(0))
    _, _, frozen = router_partition(model)
    specs = frozen_sharding_specs(frozen, axis="dp")
    flat_specs = jax.tree_util.tree_flatten_with_path(specs)[0]
    block_specs = [s for p, s in flat_specs if "blocks" in jax.tree_util.keystr(p)]
    other_specs = [s for p, s in flat_specs if "blocks" not in jax.tree_util.keystr(p)]
    assert block_specs and all(s == P("dp") for s in block_specs)
    assert other_specs and all(s == P() for s in other_specs)


def test_sharded_forward_matches_replicated():
    model = WanModel(WAN_TINY, rngs=nnx.Rngs(0))
    latents = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, WAN_TINY.in_channels))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, WAN_TINY.text_len, WAN_TINY.text_dim))
    t = jnp.asarray([500.0])
    ref = model(latents, t, ctx, attn_cfg=ATTN, routing_mode="soft", interpret=True).sample

    mesh = make_mesh(sp_size=1, dp_size=2)
    graphdef, router_state, frozen_state = router_partition(model)
    fspecs = frozen_sharding_specs(frozen_state, axis="dp")

    def fwd(rstate, fstate, latents, t, ctx):
        m = nnx.merge(graphdef, rstate, fstate)
        return m(
            latents, t, ctx, attn_cfg=ATTN, routing_mode="soft",
            interpret=True, frozen_sharded_axis="dp",
        ).sample

    f = shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), fspecs, P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    frozen_state = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), frozen_state, fspecs
    )
    out = f(router_state, frozen_state, latents, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_sharded_train_step_matches_replicated():
    model = WanModel(WAN_TINY, rngs=nnx.Rngs(0))
    graphdef, router_state, frozen_state = router_partition(model)
    sigmas = train_sigmas(shift=5.0)
    optimizer = make_optimizer(lr=1e-2)
    opt_state = optimizer.init(router_state)
    latents = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8, WAN_TINY.in_channels))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, WAN_TINY.text_len, WAN_TINY.text_dim))
    key = jax.random.PRNGKey(7)
    kw = dict(timestep_table=sigmas * 1000.0, sigma_table=sigmas,
              weights=LossWeights(), interpret=True)

    step_ref = make_router_train_step(graphdef, ATTN, optimizer, **kw)
    r_ref, _, m_ref = step_ref(
        router_state, frozen_state, opt_state, latents, ctx, key
    )

    # pure weight sharding: batch replicated so the RNG draws match the
    # single-device reference bit-for-bit (dp-sharded data changes the
    # per-rank sample shapes and therefore the draws)
    mesh = make_mesh(sp_size=1, dp_size=2)
    fspecs = frozen_sharding_specs(frozen_state, axis="dp")
    step_sh = make_router_train_step(
        graphdef, ATTN, optimizer, frozen_sharded_axis="dp", **kw
    )
    f = shard_map(
        step_sh, mesh=mesh,
        in_specs=(P(), fspecs, P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    frozen_sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), frozen_state, fspecs
    )
    r_sh, _, m_sh = f(
        router_state, frozen_sharded, opt_state, latents, ctx, key
    )
    # identical data, identical key -> identical loss and router update
    np.testing.assert_allclose(
        float(m_sh["loss"]), float(m_ref["loss"]), rtol=1e-4
    )
    a = jax.tree_util.tree_leaves(r_sh)[0]
    b = jax.tree_util.tree_leaves(r_ref)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_hunyuan_sharded_forward_matches_replicated():
    from vorta_tpu.models.hunyuan import HUNYUAN_TINY, HunyuanModel

    cfg = HUNYUAN_TINY
    model = HunyuanModel(cfg, rngs=nnx.Rngs(0))
    latents = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, cfg.in_channels))
    text = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.text_len, cfg.text_dim))
    mask = jnp.ones((1, cfg.text_len), bool)
    pooled = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.pooled_dim))
    t = jnp.asarray([500.0])
    g = jnp.asarray([1000.0])
    ref = model(latents, t, text, mask, pooled, guidance=g,
                attn_cfg=ATTN, routing_mode="soft", interpret=True).sample

    mesh = make_mesh(sp_size=1, dp_size=2)
    graphdef, router_state, frozen_state = router_partition(model)
    fspecs = frozen_sharding_specs(frozen_state, axis="dp")

    def fwd(rstate, fstate, latents, t, text, mask, pooled, g):
        m = nnx.merge(graphdef, rstate, fstate)
        return m(latents, t, text, mask, pooled, guidance=g,
                 attn_cfg=ATTN, routing_mode="soft", interpret=True,
                 frozen_sharded_axis="dp").sample

    f = shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), fspecs, P(), P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    frozen_sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), frozen_state, fspecs
    )
    out = f(router_state, frozen_sharded, latents, t, text, mask, pooled, g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
