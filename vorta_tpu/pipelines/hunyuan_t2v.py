"""HunyuanVideo text-to-video sampling (latent space).

Counterpart of the reference's patched HunyuanVideoPipeline
(vorta/patch/pipeline_hunyuan.py): flow-match Euler integration with the
model's embedded (distilled) guidance — guidance_scale * 1000 fed to the
guidance embedder, no CFG pair by default (true-CFG optional via a negative
embedding), per-prompt text mask threaded to the joint attention.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ..config import AttentionConfig
from ..models.hunyuan import HunyuanModel
from ..schedulers.flow_match import FlowMatchEulerSchedule


@dataclasses.dataclass(frozen=True)
class HunyuanSamplingConfig:
    num_inference_steps: int = 50
    guidance_scale: float = 6.0  # embedded guidance (x1000), not CFG
    true_cfg_scale: float = 1.0  # >1 enables a real CFG pair
    flow_shift: float = 7.0
    routing_mode: str = "off"  # off | hard


class HunyuanT2VPipeline:
    def __init__(
        self,
        model: HunyuanModel,
        attn_cfg: Optional[AttentionConfig] = None,
        interpret: bool = False,
    ):
        self.model = model
        self.attn_cfg = attn_cfg
        self.interpret = interpret
        self._loop_cache = {}

    def prepare_latents(self, key, batch: int, frames: int, height: int, width: int):
        cfg = self.model.cfg
        t = (frames - 1) // 4 + 1
        return jax.random.normal(
            key, (batch, t, height // 8, width // 8, cfg.in_channels), jnp.float32
        )

    def _build_loop(self, sampling: HunyuanSamplingConfig):
        schedule = FlowMatchEulerSchedule.create(
            sampling.num_inference_steps, sampling.flow_shift
        )
        attn_cfg = self.attn_cfg
        interpret = self.interpret
        routing_mode = sampling.routing_mode
        guidance_value = float(sampling.guidance_scale) * 1000.0
        do_cfg = sampling.true_cfg_scale > 1.0
        cfg_scale = float(sampling.true_cfg_scale)

        @nnx.jit
        def run(model: HunyuanModel, latents, text, mask, pooled, neg_text, neg_pooled):
            sigmas = jnp.asarray(schedule.sigmas)
            timesteps = jnp.asarray(schedule.timesteps)

            @nnx.scan(in_axes=(None, nnx.Carry, 0), out_axes=(nnx.Carry, 0))
            def step(model: HunyuanModel, x, i):
                b = x.shape[0]
                t = jnp.full((b,), timesteps[i])
                guidance = jnp.full((b,), guidance_value)
                out = model(
                    x.astype(model.dtype), t, text, mask, pooled, guidance=guidance,
                    attn_cfg=attn_cfg, routing_mode=routing_mode, interpret=interpret,
                )
                v = out.sample.astype(jnp.float32)
                if do_cfg:
                    vu = model(
                        x.astype(model.dtype), t, neg_text, mask, neg_pooled,
                        guidance=guidance, attn_cfg=attn_cfg,
                        routing_mode=routing_mode, interpret=interpret,
                    ).sample.astype(jnp.float32)
                    v = vu + cfg_scale * (v - vu)
                x = x + (sigmas[i + 1] - sigmas[i]) * v
                return x, jnp.zeros((), jnp.float32)

            x, _ = step(model, latents.astype(jnp.float32), jnp.arange(schedule.num_steps))
            return x

        return run

    def __call__(
        self,
        latents: jax.Array,
        text_states: jax.Array,  # (B, L, text_dim) llama states
        text_mask: jax.Array,  # (B, L) bool
        pooled_text: jax.Array,  # (B, pooled_dim) CLIP pooled
        negative_text_states: Optional[jax.Array] = None,
        negative_pooled_text: Optional[jax.Array] = None,
        sampling: HunyuanSamplingConfig = HunyuanSamplingConfig(),
    ) -> jax.Array:
        if sampling not in self._loop_cache:
            self._loop_cache[sampling] = self._build_loop(sampling)
        if negative_text_states is None:
            negative_text_states = jnp.zeros_like(text_states)
        if negative_pooled_text is None:
            negative_pooled_text = jnp.zeros_like(pooled_text)
        return self._loop_cache[sampling](
            self.model, latents, text_states, text_mask, pooled_text,
            negative_text_states, negative_pooled_text,
        )
