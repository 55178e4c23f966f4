"""Layer-sharded frozen parameters (FSDP-style fallback).

For DiTs whose frozen weights exceed per-chip HBM (the reference FSDP-shards
the frozen 13-14B model — vorta/train/fsdp_utils.py), the stacked per-block
frozen params shard over a mesh axis on their leading LAYER dimension; the
block loop fetches one block per scan step with a psum broadcast from its
owner, so peak weight memory is params/P plus one live block.  Router params
(tiny, trained) stay replicated.

Used from the Wan and Hunyuan model block loops; the matching shard_map /
NamedSharding spec tree comes from training.step.frozen_sharding_specs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx


def sharded_block_fetcher(graphdef, router_bs, frozen_bs, n_layers: int, axis: str):
    """Return ``block_at(i)`` merging replicated router params with block i's
    frozen params psum-broadcast from their owner rank.

    router_bs leaves are stacked (n_layers, ...) and replicated; frozen_bs
    leaves are the rank-local layer shard (n_layers/P, ...)."""
    p = jax.lax.axis_size(axis)
    if n_layers % p:
        raise ValueError(
            f"layer count {n_layers} not divisible by {axis} axis size {p}"
        )
    per = n_layers // p
    for path, leaf in jax.tree_util.tree_flatten_with_path(frozen_bs)[0]:
        if leaf.shape[0] != per:
            raise ValueError(
                f"frozen leaf {jax.tree_util.keystr(path)} has leading dim "
                f"{leaf.shape[0]}, expected the layer shard {per} "
                f"(= {n_layers}/{p}); did you device_put with "
                "frozen_sharding_specs before entering shard_map?"
            )
    me = jax.lax.axis_index(axis)

    def block_at(i):
        owner = i // per
        local_i = i - owner * per

        def get(leaf):
            row = jax.lax.dynamic_index_in_dim(leaf, local_i, 0, keepdims=False)
            row = jnp.where(owner == me, row, jnp.zeros_like(row))
            return jax.lax.psum(row, axis)

        rstate = jax.tree.map(
            lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False),
            router_bs,
        )
        return nnx.merge(graphdef, rstate, jax.tree.map(get, frozen_bs))

    return block_at
