"""Router-distillation training step.

One jitted step = rectified-flow corruption, student (soft-routed) +
frozen-teacher (full-attention) forward, composite loss, AdamW update on the
router parameters only (reference: scripts/wan/train_one_step.py +
scripts/wan/train.py:250-259).  The DiT stays frozen, so there is no ZeRO
machinery — frozen params are just replicated (or sharded) device arrays that
gradients flow *through* but never update.

Loss = w_fm * MSE(v_pred, eps - x0)        [or x0-preconditioned]
     + w_reg * sum_l mean(score_full^2)    [L2 on full-attention routing]
     + w_last * MSE(last-layer student vs teacher)
     + w_hidden * MSE(per-block hidden student vs teacher)
The reference multiplies the hidden loss by itself instead of its weight
(train_one_step.py:117-118, noted in SURVEY as a bug); we use the weight.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from ..config import AttentionConfig
from .sampling import rebalance_loss_weights, sample_timesteps


@dataclasses.dataclass(frozen=True)
class LossWeights:
    diffusion: float = 1.0
    reg: float = 0.02
    last_layer_distill: float = 20.0
    hidden_layer_distill: float = 0.0
    precondition_outputs: bool = False
    n_intervals: int = 5


def router_partition(model):
    """Split a model into (graphdef, router_state, frozen_state)."""
    router_filter = nnx.All(nnx.Param, nnx.PathContains("router"))
    return nnx.split(model, router_filter, ...)


def frozen_sharding_specs(frozen_state, axis: str = "dp"):
    """PartitionSpec pytree for FSDP-style layer sharding of the frozen DiT.

    Stacked per-block leaves (under "blocks") shard on their leading layer
    axis over ``axis``; everything else (embedders, head) stays replicated.
    Use as the shard_map in_spec / NamedSharding placement for frozen_state
    when training with ``frozen_sharded_axis`` (models/wan.py) — the fallback
    for DiTs whose frozen weights do not fit replicated, mirroring the
    reference's FSDP wrap (train/fsdp_utils.py)."""
    from jax.sharding import PartitionSpec as P

    stacked = {"blocks", "dual_blocks", "single_blocks"}

    def spec_for(path, leaf):
        segs = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        # only the STACKED block containers (leading layer axis); unstacked
        # ModuleLists like the Hunyuan token refiner stay replicated
        if "context_embedder" in segs:
            return P()
        return P(axis) if any(s in stacked for s in segs) else P()

    return jax.tree_util.tree_map_with_path(spec_for, frozen_state)


def make_router_train_step(
    graphdef,
    attn_cfg: AttentionConfig,
    optimizer: optax.GradientTransformation,
    weights: LossWeights = LossWeights(),
    timestep_table=None,  # (T,) np/jnp descending shifted timesteps
    sigma_table=None,  # (T,) matching sigmas
    sp_axis: Optional[str] = None,
    dp_axis: Optional[str] = None,
    frozen_sharded_axis: Optional[str] = None,
    interpret: bool = False,
):
    """Build the (jittable / shard_map-able) train step.

    step(router_state, frozen_state, opt_state, latents, prompt_embeds, key)
      -> (router_state, opt_state, metrics)

    With sp_axis set, call inside shard_map: latents are the rank's
    latent-frame shard and every SP rank must receive the same key.  With
    dp_axis set, gradients/metrics are averaged over it.
    """
    tt = jnp.asarray(timestep_table)
    st = jnp.asarray(sigma_table)

    def loss_fn(router_state, frozen_state, latents, prompt_embeds, key):
        model = nnx.merge(graphdef, router_state, frozen_state)
        b = latents.shape[0]
        k_t, k_eps = jax.random.split(key)
        timesteps, sigmas = sample_timesteps(
            k_t, b, tt, st, n_intervals=weights.n_intervals
        )
        x0 = latents.astype(jnp.float32)
        eps = jax.random.normal(k_eps, x0.shape, jnp.float32)
        if sp_axis is not None:
            # every SP rank holds a different frame shard: same key, but
            # decorrelate noise by rank while keeping timesteps identical
            r = jax.lax.axis_index(sp_axis)
            eps = jax.random.normal(jax.random.fold_in(k_eps, r), x0.shape, jnp.float32)
        sig = sigmas[:, None, None, None, None]
        noisy = (1.0 - sig) * x0 + sig * eps

        out = model(
            noisy.astype(model.dtype),
            timesteps,
            prompt_embeds,
            attn_cfg=attn_cfg,
            routing_mode="soft",
            return_losses=True,
            remat_blocks=True,
            interpret=interpret,
            sp_axis=sp_axis,
            frozen_sharded_axis=frozen_sharded_axis,
        )
        pred = out.sample.astype(jnp.float32)
        if weights.precondition_outputs:
            pred_x0 = noisy - pred * sig
            fm = jnp.mean(jnp.square(pred_x0 - x0))
        else:
            fm = jnp.mean(jnp.square(pred - (eps - x0)))

        dw, (w_reg, w_last, w_hidden) = rebalance_loss_weights(
            weights.diffusion,
            (weights.reg, weights.last_layer_distill, weights.hidden_layer_distill),
            timesteps,
            n_intervals=weights.n_intervals,
        )
        reg = out.reg_loss
        last = out.last_layer_distill_loss
        hidden = out.hidden_layer_distill_loss
        if sp_axis is not None:
            fm = jax.lax.pmean(fm, sp_axis)
            last = jax.lax.pmean(last, sp_axis)
            hidden = jax.lax.pmean(hidden, sp_axis)
        loss = dw * fm + w_reg * reg + w_last * last + w_hidden * hidden
        metrics = {
            "loss": loss,
            "l_fm": fm,
            "l_reg": reg,
            "l_last": last,
            "l_hidden": hidden,
            "timestep": timesteps[0],
        }
        return loss, metrics

    def train_step(router_state, frozen_state, opt_state, latents, prompt_embeds, key):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            router_state, frozen_state, latents, prompt_embeds, key
        )
        if dp_axis is not None:
            grads = jax.lax.pmean(grads, dp_axis)
            metrics = jax.tree.map(lambda m: jax.lax.pmean(m, dp_axis), metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = optimizer.update(
            grads, opt_state, params=router_state
        )
        router_state = optax.apply_updates(router_state, updates)
        return router_state, opt_state, metrics

    return train_step


def make_hunyuan_router_train_step(
    graphdef,
    attn_cfg: AttentionConfig,
    optimizer: optax.GradientTransformation,
    weights: LossWeights = LossWeights(),
    timestep_table=None,
    sigma_table=None,
    guidance_value: float = 1000.0,  # reference: const guidance 1000 at train
    sp_axis: Optional[str] = None,
    dp_axis: Optional[str] = None,
    frozen_sharded_axis: Optional[str] = None,
    interpret: bool = False,
):
    """Hunyuan variant: batch carries (latents, text_states, text_mask,
    pooled_text) — reference scripts/hunyuan/train_one_step.py (pooled
    projection split from the prompt embed, guidance=1000).

    With sp_axis set (inside shard_map): latents carry the rank's
    latent-frame shard, text/mask/pooled are replicated, and the joint
    attention does the Ulysses head<->sequence reshard internally
    (models/hunyuan._sp_joint_in/_sp_joint_out)."""
    tt = jnp.asarray(timestep_table)
    st = jnp.asarray(sigma_table)

    def loss_fn(router_state, frozen_state, latents, text, mask, pooled, key):
        model = nnx.merge(graphdef, router_state, frozen_state)
        b = latents.shape[0]
        k_t, k_eps = jax.random.split(key)
        timesteps, sigmas = sample_timesteps(k_t, b, tt, st, n_intervals=weights.n_intervals)
        x0 = latents.astype(jnp.float32)
        eps = jax.random.normal(k_eps, x0.shape, jnp.float32)
        if sp_axis is not None:
            r = jax.lax.axis_index(sp_axis)
            eps = jax.random.normal(jax.random.fold_in(k_eps, r), x0.shape, jnp.float32)
        sig = sigmas[:, None, None, None, None]
        noisy = (1.0 - sig) * x0 + sig * eps

        out = model(
            noisy.astype(model.dtype), timesteps, text, mask, pooled,
            guidance=jnp.full((b,), guidance_value),
            attn_cfg=attn_cfg, routing_mode="soft",
            return_losses=True,
            remat_blocks=True, interpret=interpret, sp_axis=sp_axis,
            frozen_sharded_axis=frozen_sharded_axis,
        )
        pred = out.sample.astype(jnp.float32)
        if weights.precondition_outputs:
            fm = jnp.mean(jnp.square((noisy - pred * sig) - x0))
        else:
            fm = jnp.mean(jnp.square(pred - (eps - x0)))
        dw, (w_reg, w_last, w_hidden) = rebalance_loss_weights(
            weights.diffusion,
            (weights.reg, weights.last_layer_distill, weights.hidden_layer_distill),
            timesteps, n_intervals=weights.n_intervals,
        )
        fm_, last, hidden = fm, out.last_layer_distill_loss, out.hidden_layer_distill_loss
        if sp_axis is not None:
            fm_ = jax.lax.pmean(fm_, sp_axis)
            last = jax.lax.pmean(last, sp_axis)
            hidden = jax.lax.pmean(hidden, sp_axis)
        loss = dw * fm_ + w_reg * out.reg_loss + w_last * last + w_hidden * hidden
        metrics = {
            "loss": loss, "l_fm": fm_, "l_reg": out.reg_loss,
            "l_last": last, "l_hidden": hidden, "timestep": timesteps[0],
        }
        return loss, metrics

    def train_step(router_state, frozen_state, opt_state, latents, text, mask, pooled, key):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            router_state, frozen_state, latents, text, mask, pooled, key
        )
        if dp_axis is not None:
            grads = jax.lax.pmean(grads, dp_axis)
            metrics = jax.tree.map(lambda m: jax.lax.pmean(m, dp_axis), metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params=router_state)
        router_state = optax.apply_updates(router_state, updates)
        return router_state, opt_state, metrics

    return train_step


def make_optimizer(
    lr: float = 1e-2,
    weight_decay: float = 1e-4,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    max_grad_norm: float = 1.0,
    warmup_steps: int = 0,
    total_steps: Optional[int] = None,
    schedule: str = "constant",
) -> optax.GradientTransformation:
    """AdamW + global-norm clipping + LR schedule (reference train.py:250-272)."""
    if schedule == "constant":
        if warmup_steps:
            sched = optax.schedules.warmup_constant_schedule(0.0, lr, warmup_steps)
        else:
            sched = lr
    elif schedule == "linear":
        if total_steps is None:
            raise ValueError("linear schedule needs total_steps")
        sched = optax.schedules.join_schedules(
            [
                optax.schedules.linear_schedule(0.0, lr, max(warmup_steps, 1)),
                optax.schedules.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1)),
            ],
            [warmup_steps],
        )
    elif schedule == "cosine":
        if total_steps is None:
            raise ValueError("cosine schedule needs total_steps")
        sched = optax.schedules.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps, total_steps
        )
    else:
        raise ValueError(f"unknown schedule {schedule!r}")
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(sched, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay),
    )
