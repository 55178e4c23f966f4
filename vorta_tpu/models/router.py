"""Per-block routing MLP.

The only trained component of the whole system: maps the (pre-projection)
timestep embedding to a per-head distribution over the three attention
experts (reference: vorta/patch/router.py:17-43 — SiLU -> Linear -> softmax).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx


class Router(nnx.Module):
    def __init__(
        self,
        embedding_dim: int,
        heads: int,
        num_experts: int = 3,
        *,
        dtype=jnp.float32,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.heads = heads
        self.num_experts = num_experts
        self.linear = nnx.Linear(
            embedding_dim,
            heads * num_experts,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )

    def __call__(self, temb: jax.Array) -> jax.Array:
        """temb: (B, D) timestep embedding -> (B, heads, num_experts) scores."""
        logits = self.linear(jax.nn.silu(temb))
        logits = logits.reshape(temb.shape[0], self.heads, self.num_experts)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
