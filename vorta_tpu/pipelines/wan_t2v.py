"""Wan text-to-video sampling pipeline (latent space).

Functional replacement for the reference's monkey-patched
``vorta_pipeline_call`` (vorta/patch/pipeline_wan.py:203-390): classifier-free
guidance with two transformer evaluations per step, flow-match Euler
integration, optional routed sparse attention.  The denoise loop runs as a
``lax.scan`` under a single jit — the scheduler tables are trace-time
constants, there is no host round-trip per step.

Text encoding and VAE decode are separate stages (io/ and models/vae) so this
module stays a pure latents -> latents function.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ..config import AttentionConfig
from ..models.wan import WanModel
from ..schedulers.flow_match import FlowMatchEulerSchedule


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    num_inference_steps: int = 50
    guidance_scale: float = 5.0
    flow_shift: float = 5.0
    routing_mode: str = "off"  # off | hard
    mm_precision: str = "bf16"  # bf16 | int8 (W8A8 serving mode, ops/qmm.py)
    scheduler: str = "unipc"  # unipc (reference inference default) | euler
    return_scores: bool = False
    # run the CFG cond+uncond passes as ONE batch-2B forward instead of two
    # sequential forwards: same math, ~halves per-step launch/scheduling
    # overhead and doubles matmul batch (costs 2x activation memory)
    cfg_batch: bool = False
    # step-residual caching (ops/stepcache.py): skip the DiT block stack
    # when the accumulated timestep-embedding distance since the last
    # computed step stays under this threshold.  0.0 = off.  Each CFG arm
    # keeps its own cache; warmup steps and the final step always compute.
    cache_threshold: float = 0.0
    cache_warmup: int = 1
    # optional fitted polynomial (highest-degree first) rescaling the raw
    # indicator distance (TeaCache coefficients; identity when None)
    cache_coefficients: Optional[tuple] = None


class WanT2VPipeline:
    """Latent-space T2V sampler.

    With ``mesh`` set (a (dp, sp) Mesh), each denoise step runs inside
    shard_map: latent frames shard over the sp axis (Ulysses attention
    all-to-all inside the model), conditioning replicated, scheduler math on
    the sharded global array outside — the reference's SP pipeline
    (pipeline_wan.py:300-366) without the NCCL choreography.
    """

    def __init__(
        self,
        model: WanModel,
        attn_cfg: Optional[AttentionConfig] = None,
        interpret: bool = False,
        mesh=None,
        act_scales: Optional[dict] = None,
        quantized_blocks=None,
    ):
        self.model = model
        self.attn_cfg = attn_cfg
        self.interpret = interpret
        self.mesh = mesh
        # {site: (L,) static activation scales} for mm_precision="int8"
        # (ops/qmm.py; produced by tools/calibrate_int8.py)
        self.act_scales = act_scales
        # stacked int4/int8 block weights (ops/quant.quantize_stacked_tree):
        # serving path for models that exceed one chip's HBM (Wan-14B); the
        # model is then a depth-1 placeholder supplying the non-block modules
        # (see cli/sample.py --quantize_blocks).  Replaces the reference's
        # model CPU offload (scripts/wan/inference.py:156-162).
        self.quantized_blocks = quantized_blocks
        self._loop_cache = {}

    def prepare_latents(self, key: jax.Array, batch: int, frames: int, height: int, width: int):
        """Initial noise in latent space, channels-last (B, T, H/8, W/8, C)."""
        cfg = self.model.cfg
        t = (frames - 1) // 4 + 1
        shape = (batch, t, height // 8, width // 8, cfg.in_channels)
        return jax.random.normal(key, shape, jnp.float32)

    def _build_step_parts(self, sampling: SamplingConfig):
        """Shared single-step denoise body: used by the jit'd scan loop and
        by the host-driven stepper (make_stepper)."""
        from ..schedulers.unipc import UniPCSchedule, unipc_sample_step

        if sampling.scheduler == "unipc":
            schedule = UniPCSchedule.create(
                sampling.num_inference_steps, sampling.flow_shift
            )
        elif sampling.scheduler == "euler":
            schedule = FlowMatchEulerSchedule.create(
                sampling.num_inference_steps, sampling.flow_shift
            )
        else:
            raise ValueError(f"unknown scheduler {sampling.scheduler!r}")
        use_unipc = sampling.scheduler == "unipc"
        attn_cfg = self.attn_cfg
        interpret = self.interpret
        guidance_scale = float(sampling.guidance_scale)
        do_cfg = sampling.guidance_scale > 1.0
        cfg_batch = sampling.cfg_batch and do_cfg
        routing_mode = sampling.routing_mode
        mm = sampling.mm_precision
        act_scales = self.act_scales
        return_scores = sampling.return_scores
        cache_threshold = float(sampling.cache_threshold)
        use_cache = cache_threshold > 0.0
        cache_warmup = int(sampling.cache_warmup)
        cache_coefficients = sampling.cache_coefficients
        qblocks = self.quantized_blocks
        n_steps = schedule.num_steps
        cfg = self.model.cfg

        def init_carry(latents):
            b0, t_px, h_px, w_px, _ = latents.shape
            pt, ph, pw = cfg.patch_size
            seq = (t_px // pt) * (h_px // ph) * (w_px // pw)
            ind_dim = 6 * cfg.dim

            def init_caches():
                # one cache per DiT evaluation stream: the batched-CFG path
                # is one stream at batch 2B; sequential CFG is two streams
                if not use_cache:
                    return ()
                from ..ops.stepcache import init_step_cache

                dt = self.model.dtype
                if cfg_batch:
                    return (init_step_cache(2 * b0, seq, cfg.dim, ind_dim, dt),)
                if do_cfg:
                    return (init_step_cache(b0, seq, cfg.dim, ind_dim, dt),
                            init_step_cache(b0, seq, cfg.dim, ind_dim, dt))
                return (init_step_cache(b0, seq, cfg.dim, ind_dim, dt),)

            x0 = latents.astype(jnp.float32)
            return (x0, jnp.zeros_like(x0), jnp.zeros_like(x0), x0,
                    init_caches())

        def denoise_step(model, carry, i, prompt_embeds,
                         negative_prompt_embeds, image_embeds):
            sigmas = jnp.asarray(schedule.sigmas)
            timesteps = jnp.asarray(schedule.timesteps)
            x, m_prev, m_prev2, x_prev, caches = carry
            t = jnp.full((x.shape[0],), timesteps[i])
            force = (i < cache_warmup) | (i == n_steps - 1)
            ckw = dict(cache_threshold=cache_threshold,
                       cache_force_compute=force,
                       cache_coefficients=cache_coefficients) if use_cache else {}
            new_caches = ()
            if cfg_batch:
                # one batch-2B forward: [cond | uncond]
                out = model(
                    jnp.concatenate([x, x]).astype(model.dtype),
                    jnp.concatenate([t, t]),
                    jnp.concatenate([prompt_embeds, negative_prompt_embeds]),
                    attn_cfg=attn_cfg,
                    routing_mode=routing_mode,
                    return_scores=return_scores,
                    image_context=(
                        jnp.concatenate([image_embeds, image_embeds])
                        if image_embeds is not None else None
                    ),
                    interpret=interpret,
                    mm_precision=mm, act_scales=act_scales,
                    quantized_blocks=qblocks,
                    step_cache=caches[0] if use_cache else None, **ckw,
                )
                if use_cache:
                    new_caches = (out.step_cache,)
                bb = x.shape[0]
                vc = out.sample[:bb].astype(jnp.float32)
                vu = out.sample[bb:].astype(jnp.float32)
                velocity = vu + guidance_scale * (vc - vu)
            else:
                out = model(
                    x.astype(model.dtype),
                    t,
                    prompt_embeds,
                    attn_cfg=attn_cfg,
                    routing_mode=routing_mode,
                    return_scores=return_scores,
                    image_context=image_embeds,
                    interpret=interpret,
                    mm_precision=mm, act_scales=act_scales,
                    quantized_blocks=qblocks,
                    step_cache=caches[0] if use_cache else None, **ckw,
                )
                if use_cache:
                    new_caches = (out.step_cache,)
                velocity = out.sample.astype(jnp.float32)
            if do_cfg and not cfg_batch:
                # image conditioning stays on for the uncond pass
                # (reference I2V: encoder image tokens are not dropped
                # for CFG — vorta/attention/wan.py:119-139)
                out_u = model(
                    x.astype(model.dtype),
                    t,
                    negative_prompt_embeds,
                    attn_cfg=attn_cfg,
                    routing_mode=routing_mode,
                    image_context=image_embeds,
                    interpret=interpret,
                    mm_precision=mm, act_scales=act_scales,
                    quantized_blocks=qblocks,
                    step_cache=caches[1] if use_cache else None, **ckw,
                )
                if use_cache:
                    new_caches = new_caches + (out_u.step_cache,)
                vu = out_u.sample.astype(jnp.float32)
                velocity = vu + guidance_scale * (velocity - vu)
            if use_unipc:
                x_next, m_i, x_hist = unipc_sample_step(
                    x, velocity, i, sigmas, m_prev, x_prev, n_steps,
                    m_prev2=m_prev2,
                )
            else:
                x_next = x + (sigmas[i + 1] - sigmas[i]) * velocity
                m_i, x_hist = m_prev, x_prev
            scores = out.routing_scores if return_scores else jnp.zeros((), jnp.float32)
            return (x_next, m_i, m_prev, x_hist, new_caches), scores

        return denoise_step, init_carry, n_steps, dict(locals())

    def make_stepper(self, sampling: SamplingConfig, chunk: int = 1):
        """Host-driven serving loop: (init_carry, step_once, n_steps).

        ``step_once(carry, i, pe, ne, image_embeds)`` runs ``chunk`` denoise
        steps starting at step ``i`` as one jit dispatch (the same compiled
        program for every call — the step index is traced).  Use when a
        single dispatch must stay short (e.g. remote-tunneled TPUs kill
        >60 s dispatches, where a 50-step 720p scan cannot run as one jit)
        or when the host wants per-step control (progress, early exit,
        per-step telemetry).  ``chunk > 1`` amortizes the per-dispatch
        overhead (measured ~3-7 s/dispatch through a remote tunnel) over
        several steps while keeping each dispatch under the kill limit.
        The jit'd scan loop (__call__) remains the preferred path on local
        hardware.  The caller steps i by ``chunk``; a final partial chunk
        is NOT supported — pick chunk dividing num_inference_steps.
        """
        denoise_step, init_carry, n_steps, _env = self._build_step_parts(sampling)
        model = self.model
        if n_steps % chunk != 0:
            raise ValueError(f"chunk {chunk} must divide num_inference_steps {n_steps}")

        @nnx.jit
        def step_once(model: WanModel, carry, i, pe, ne, image_embeds):
            if chunk == 1:
                return denoise_step(model, carry, i, pe, ne, image_embeds)

            @nnx.scan(in_axes=(None, nnx.Carry, 0), out_axes=(nnx.Carry, 0))
            def body(model: WanModel, c, j):
                return denoise_step(model, c, j, pe, ne, image_embeds)

            return body(model, carry, i + jnp.arange(chunk, dtype=jnp.int32))

        def step_fn(carry, i, pe, ne, image_embeds=None):
            return step_once(model, carry, jnp.asarray(i, jnp.int32), pe, ne,
                             image_embeds)

        return init_carry, step_fn, n_steps

    def _build_loop(self, sampling: SamplingConfig, has_image: bool = False):
        denoise_step, init_carry, n_steps, _env = self._build_step_parts(sampling)
        return_scores = sampling.return_scores

        @nnx.jit
        def run(model: WanModel, latents, prompt_embeds, negative_prompt_embeds,
                image_embeds):
            @nnx.scan(in_axes=(None, nnx.Carry, 0), out_axes=(nnx.Carry, 0))
            def step(model: WanModel, carry, i):
                return denoise_step(model, carry, i, prompt_embeds,
                                    negative_prompt_embeds, image_embeds)

            (x, _, _, _, _), scores = step(
                model, init_carry(latents), jnp.arange(n_steps)
            )
            return x, scores

        if self.mesh is None:
            return run

        # --- SP path: re-bind the sampling-derived locals computed by
        # _build_step_parts (the shard_map'd velocity_fn below closes over
        # them directly rather than through denoise_step)
        schedule = _env["schedule"]
        use_unipc = _env["use_unipc"]
        attn_cfg = _env["attn_cfg"]
        interpret = _env["interpret"]
        do_cfg = _env["do_cfg"]
        cfg_batch = _env["cfg_batch"]
        routing_mode = _env["routing_mode"]
        mm = _env["mm"]
        act_scales = _env["act_scales"]
        cache_threshold = _env["cache_threshold"]
        use_cache = _env["use_cache"]
        cache_warmup = _env["cache_warmup"]
        cache_coefficients = _env["cache_coefficients"]
        qblocks = _env["qblocks"]
        guidance_scale = _env["guidance_scale"]
        from ..schedulers.unipc import unipc_sample_step

        # --- sequence-parallel loop: shard_map'd model step inside the scan
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.mesh
        graphdef, _ = nnx.split(self.model)

        def velocity_fn(state, x, pe, ne, img, t, caches, force, qb):
            model = nnx.merge(graphdef, state)
            ckw = dict(cache_threshold=cache_threshold,
                       cache_force_compute=force,
                       cache_coefficients=cache_coefficients) if use_cache else {}
            new_caches = ()
            if cfg_batch:
                out = model(
                    jnp.concatenate([x, x]).astype(model.dtype),
                    jnp.concatenate([t, t]),
                    jnp.concatenate([pe, ne]),
                    attn_cfg=attn_cfg, routing_mode=routing_mode,
                    image_context=(
                        jnp.concatenate([img, img]) if img is not None else None
                    ),
                    interpret=interpret, sp_axis="sp",
                    mm_precision=mm, act_scales=act_scales,
                    quantized_blocks=qb,
                    step_cache=caches[0] if use_cache else None, **ckw,
                )
                if use_cache:
                    new_caches = (out.step_cache,)
                bb = x.shape[0]
                vc = out.sample[:bb].astype(jnp.float32)
                vu = out.sample[bb:].astype(jnp.float32)
                return vu + guidance_scale * (vc - vu), new_caches
            out = model(
                x.astype(model.dtype), t, pe,
                attn_cfg=attn_cfg, routing_mode=routing_mode,
                image_context=img, interpret=interpret, sp_axis="sp",
                mm_precision=mm, act_scales=act_scales,
                quantized_blocks=qb,
                step_cache=caches[0] if use_cache else None, **ckw,
            )
            if use_cache:
                new_caches = (out.step_cache,)
            v = out.sample.astype(jnp.float32)
            if do_cfg:
                out_u = model(
                    x.astype(model.dtype), t, ne,
                    attn_cfg=attn_cfg, routing_mode=routing_mode,
                    image_context=img, interpret=interpret, sp_axis="sp",
                    mm_precision=mm, act_scales=act_scales,
                    quantized_blocks=qb,
                    step_cache=caches[1] if use_cache else None, **ckw,
                )
                if use_cache:
                    new_caches = new_caches + (out_u.step_cache,)
                vu = out_u.sample.astype(jnp.float32)
                v = vu + guidance_scale * (v - vu)
            return v, new_caches

        # per-arm cache specs: the residual lives in token space, sharded
        # over the sequence like the latents; indicator/acc/valid replicated
        from ..ops.stepcache import StepCache as _SC, init_step_cache

        cache_spec = _SC(prev_ind=P(), residual=P(None, "sp"), acc=P(), valid=P())
        n_arms = 0
        if use_cache:
            n_arms = 1 if (cfg_batch or not do_cfg) else 2
        cache_specs = (cache_spec,) * n_arms

        # quantized stack (if any) is replicated across the mesh: each chip
        # holds the int4/int8 weights and dequantizes its own block copies
        qb_specs = jax.tree.map(lambda _: P(), qblocks) if qblocks is not None else None
        smapped = shard_map(
            velocity_fn, mesh=mesh,
            in_specs=(P(), P(None, "sp"), P(), P(), P(), P(), cache_specs, P(),
                      qb_specs),
            out_specs=(P(None, "sp"), cache_specs),
            check_vma=False,
        )

        def run_sp(model, latents, pe, ne, image_embeds):
            _, state = nnx.split(model)
            sigmas = jnp.asarray(schedule.sigmas)
            timesteps = jnp.asarray(schedule.timesteps)
            n_steps = schedule.num_steps
            latents = jax.device_put(
                latents.astype(jnp.float32), NamedSharding(mesh, P(None, "sp"))
            )
            caches0 = ()
            if use_cache:
                cfg = self.model.cfg
                pt, ph, pw = cfg.patch_size
                b0, t_px, h_px, w_px, _ = latents.shape
                seq = (t_px // pt) * (h_px // ph) * (w_px // pw)
                def mk(nb):
                    c = init_step_cache(nb, seq, cfg.dim, 6 * cfg.dim,
                                        self.model.dtype)
                    return _SC(*(jax.device_put(a, NamedSharding(mesh, s))
                                 for a, s in zip(c, cache_spec)))

                caches0 = tuple(
                    mk(2 * b0 if cfg_batch else b0) for _ in range(n_arms)
                )

            @jax.jit
            def loop(state, latents, pe, ne, image_embeds, caches0):
                def body(carry, i):
                    x, m_prev, m_prev2, x_prev, caches = carry
                    t = jnp.full((x.shape[0],), timesteps[i])
                    force = (i < cache_warmup) | (i == n_steps - 1)
                    v, new_caches = smapped(
                        state, x, pe, ne, image_embeds, t, caches, force,
                        qblocks,
                    )
                    if use_unipc:
                        x_next, m_i, x_hist = unipc_sample_step(
                            x, v, i, sigmas, m_prev, x_prev, n_steps,
                            m_prev2=m_prev2,
                        )
                    else:
                        x_next = x + (sigmas[i + 1] - sigmas[i]) * v
                        m_i, x_hist = m_prev, x_prev
                    return (x_next, m_i, m_prev, x_hist, new_caches), ()

                (x, _, _, _, _), _ = jax.lax.scan(
                    body,
                    (latents, jnp.zeros_like(latents), jnp.zeros_like(latents),
                     latents, caches0),
                    jnp.arange(n_steps),
                )
                return x

            return loop(state, latents, pe, ne, image_embeds, caches0), None

        return run_sp

    def __call__(
        self,
        latents: jax.Array,  # (B, T, H, W, C) initial noise
        prompt_embeds: jax.Array,  # (B, L, text_dim)
        negative_prompt_embeds: Optional[jax.Array] = None,
        sampling: SamplingConfig = SamplingConfig(),
        image_embeds: Optional[jax.Array] = None,  # (B, 257, image_dim) I2V
    ):
        """Returns (final_latents, per-step routing scores if requested).

        ``image_embeds`` (CLIP image tokens) enables the I2V image-KV cross
        attention branch (reference: vorta/attention/wan.py:72-75,119-139);
        the model must be configured with ``image_dim``.
        """
        key = (sampling, image_embeds is not None)
        if key not in self._loop_cache:
            self._loop_cache[key] = self._build_loop(
                sampling, has_image=image_embeds is not None
            )
        if negative_prompt_embeds is None:
            negative_prompt_embeds = jnp.zeros_like(prompt_embeds)
        return self._loop_cache[key](
            self.model, latents, prompt_embeds, negative_prompt_embeds,
            image_embeds,
        )
