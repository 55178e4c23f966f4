"""HunyuanVideo text-to-video sampling.

Counterpart of the reference's patched HunyuanVideoPipeline
(vorta/patch/pipeline_hunyuan.py): flow-match integration with the model's
embedded (distilled) guidance — guidance_scale * 1000 fed to the guidance
embedder, no CFG pair by default (true-CFG optional via a negative
embedding), per-prompt text mask threaded to the joint attention, VAE decode
with the scaling_factor denormalization (pipeline_hunyuan.py:460-463) and
optional tiled decode (scripts/hunyuan/inference.py:100 vae.enable_tiling).

With ``mesh`` set (a (dp, sp) Mesh) the denoise step runs inside shard_map:
latent frames shard over sp (joint-attention Ulysses all-to-all inside the
model — the reference's latent shard/gather at pipeline_hunyuan.py:367-369,
457-458 without the NCCL choreography).
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
    mm_precision: str = "bf16"  # bf16 | int8 (W8A8 serving mode, ops/qmm.py)
    scheduler: str = "euler"  # euler (reference hunyuan default) | unipc
    # run the true-CFG cond+uncond passes as ONE batch-2B forward (see
    # wan_t2v.SamplingConfig.cfg_batch); no effect without true_cfg_scale > 1
    cfg_batch: bool = False
    # step-residual caching (ops/stepcache.py): skip both block stacks when
    # the accumulated timestep-embedding distance since the last computed
    # step stays under this threshold.  0.0 = off.
    cache_threshold: float = 0.0
    cache_warmup: int = 1
    cache_coefficients: Optional[tuple] = None


class HunyuanT2VPipeline:
    def __init__(
        self,
        model: HunyuanModel,
        attn_cfg: Optional[AttentionConfig] = None,
        interpret: bool = False,
        mesh=None,
        vae=None,
        act_scales: Optional[dict] = None,
        quantized_blocks=None,
    ):
        self.model = model
        self.attn_cfg = attn_cfg
        self.interpret = interpret
        self.mesh = mesh
        self.vae = vae
        # {site: (L,) static activation scales} for mm_precision="int8"
        # (ops/qmm.py; produced by tools/calibrate_int8.py)
        self.act_scales = act_scales
        # (dual, single) stacked int4/int8 block weights for over-HBM serving
        # (ops/quant; cli/sample.py --quantize_blocks) — the model is then a
        # depth-1 placeholder supplying non-block modules
        self.quantized_blocks = quantized_blocks
        self._loop_cache = {}

    def prepare_latents(self, key, batch: int, frames: int, height: int, width: int):
        cfg = self.model.cfg
        t = (frames - 1) // 4 + 1
        return jax.random.normal(
            key, (batch, t, height // 8, width // 8, cfg.in_channels), jnp.float32
        )

    def _make_schedule(self, sampling: HunyuanSamplingConfig):
        if sampling.scheduler == "unipc":
            from ..schedulers.unipc import UniPCSchedule

            return UniPCSchedule.create(
                sampling.num_inference_steps, sampling.flow_shift
            ), True
        if sampling.scheduler == "euler":
            return FlowMatchEulerSchedule.create(
                sampling.num_inference_steps, sampling.flow_shift
            ), False
        raise ValueError(f"unknown scheduler {sampling.scheduler!r}")

    def _build_step_parts(self, sampling: HunyuanSamplingConfig):
        """Shared single-step denoise body (see wan_t2v._build_step_parts)."""
        from ..schedulers.unipc import unipc_sample_step

        schedule, use_unipc = self._make_schedule(sampling)
        attn_cfg = self.attn_cfg
        interpret = self.interpret
        routing_mode = sampling.routing_mode
        mm = sampling.mm_precision
        act_scales = self.act_scales
        guidance_value = float(sampling.guidance_scale) * 1000.0
        do_cfg = sampling.true_cfg_scale > 1.0
        cfg_scale = float(sampling.true_cfg_scale)
        cfg_batch = sampling.cfg_batch and do_cfg
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

            def init_caches():
                if not use_cache:
                    return ()
                from ..ops.stepcache import init_step_cache

                mk = lambda nb: init_step_cache(nb, seq, cfg.dim, cfg.dim,
                                                self.model.dtype)
                if cfg_batch:
                    return (mk(2 * b0),)
                if do_cfg:
                    return (mk(b0), mk(b0))
                return (mk(b0),)

            x0 = latents.astype(jnp.float32)
            return (x0, jnp.zeros_like(x0), jnp.zeros_like(x0), x0,
                    init_caches())

        def denoise_step(model, carry, i, text, mask, pooled, neg_text,
                         neg_pooled):
            sigmas = jnp.asarray(schedule.sigmas)
            timesteps = jnp.asarray(schedule.timesteps)
            x, m_prev, m_prev2, x_prev, caches = carry
            b = x.shape[0]
            t = jnp.full((b,), timesteps[i])
            guidance = jnp.full((b,), guidance_value)
            force = (i < cache_warmup) | (i == n_steps - 1)
            ckw = dict(cache_threshold=cache_threshold,
                       cache_force_compute=force,
                       cache_coefficients=cache_coefficients) if use_cache else {}
            new_caches = ()
            if cfg_batch:
                out = model(
                    jnp.concatenate([x, x]).astype(model.dtype),
                    jnp.concatenate([t, t]),
                    jnp.concatenate([text, neg_text]),
                    jnp.concatenate([mask, mask]),
                    jnp.concatenate([pooled, neg_pooled]),
                    guidance=jnp.concatenate([guidance, guidance]),
                    attn_cfg=attn_cfg, routing_mode=routing_mode,
                    interpret=interpret,
                    mm_precision=mm, act_scales=act_scales,
                    quantized_blocks=qblocks,
                    step_cache=caches[0] if use_cache else None, **ckw,
                )
                if use_cache:
                    new_caches = (out.step_cache,)
                vc = out.sample[:b].astype(jnp.float32)
                vu = out.sample[b:].astype(jnp.float32)
                v = vu + cfg_scale * (vc - vu)
            else:
                out = model(
                    x.astype(model.dtype), t, text, mask, pooled, guidance=guidance,
                    attn_cfg=attn_cfg, routing_mode=routing_mode, interpret=interpret,
                    mm_precision=mm, act_scales=act_scales,
                    quantized_blocks=qblocks,
                    step_cache=caches[0] if use_cache else None, **ckw,
                )
                if use_cache:
                    new_caches = (out.step_cache,)
                v = out.sample.astype(jnp.float32)
            if do_cfg and not cfg_batch:
                out_u = model(
                    x.astype(model.dtype), t, neg_text, mask, neg_pooled,
                    guidance=guidance, attn_cfg=attn_cfg,
                    routing_mode=routing_mode, interpret=interpret,
                    mm_precision=mm, act_scales=act_scales,
                    quantized_blocks=qblocks,
                    step_cache=caches[1] if use_cache else None, **ckw,
                )
                if use_cache:
                    new_caches = new_caches + (out_u.step_cache,)
                vu = out_u.sample.astype(jnp.float32)
                v = vu + cfg_scale * (v - vu)
            if use_unipc:
                x_next, m_i, x_hist = unipc_sample_step(
                    x, v, i, sigmas, m_prev, x_prev, n_steps,
                    m_prev2=m_prev2,
                )
            else:
                x_next = x + (sigmas[i + 1] - sigmas[i]) * v
                m_i, x_hist = m_prev, x_prev
            return (x_next, m_i, m_prev, x_hist, new_caches), jnp.zeros((), jnp.float32)

        return denoise_step, init_carry, n_steps, dict(locals())

    def make_stepper(self, sampling: HunyuanSamplingConfig, chunk: int = 1):
        """Host-driven serving loop (see WanT2VPipeline.make_stepper)."""
        denoise_step, init_carry, n_steps, _env = self._build_step_parts(sampling)
        model = self.model
        if n_steps % chunk != 0:
            raise ValueError(f"chunk {chunk} must divide num_inference_steps {n_steps}")

        @nnx.jit
        def step_once(model: HunyuanModel, carry, i, text, mask, pooled,
                      neg_text, neg_pooled):
            if chunk == 1:
                return denoise_step(model, carry, i, text, mask, pooled,
                                    neg_text, neg_pooled)

            @nnx.scan(in_axes=(None, nnx.Carry, 0), out_axes=(nnx.Carry, 0))
            def body(model: HunyuanModel, c, j):
                return denoise_step(model, c, j, text, mask, pooled,
                                    neg_text, neg_pooled)

            return body(model, carry, i + jnp.arange(chunk, dtype=jnp.int32))

        def step_fn(carry, i, text, mask, pooled, neg_text=None,
                    neg_pooled=None):
            if neg_text is None:
                neg_text = jnp.zeros_like(text)
            if neg_pooled is None:
                neg_pooled = jnp.zeros_like(pooled)
            return step_once(model, carry, jnp.asarray(i, jnp.int32), text,
                             mask, pooled, neg_text, neg_pooled)

        return init_carry, step_fn, n_steps

    def _build_loop(self, sampling: HunyuanSamplingConfig):
        denoise_step, init_carry, n_steps, _env = self._build_step_parts(sampling)

        @nnx.jit
        def run(model: HunyuanModel, latents, text, mask, pooled, neg_text, neg_pooled):
            @nnx.scan(in_axes=(None, nnx.Carry, 0), out_axes=(nnx.Carry, 0))
            def step(model: HunyuanModel, carry, i):
                return denoise_step(model, carry, i, text, mask, pooled,
                                    neg_text, neg_pooled)

            (x, _, _, _, _), _ = step(
                model, init_carry(latents), jnp.arange(n_steps)
            )
            return x

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
        guidance_value = _env["guidance_value"]
        cfg_scale = _env["cfg_scale"]
        from ..schedulers.unipc import unipc_sample_step

        # --- sequence-parallel loop: shard_map'd model step inside the scan
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.mesh
        graphdef, _ = nnx.split(self.model)

        def velocity_fn(state, x, text, mask, pooled, neg_text, neg_pooled, t,
                        caches, force, qb):
            model = nnx.merge(graphdef, state)
            b = x.shape[0]
            guidance = jnp.full((b,), guidance_value)
            ckw = dict(cache_threshold=cache_threshold,
                       cache_force_compute=force,
                       cache_coefficients=cache_coefficients) if use_cache else {}
            new_caches = ()
            out = model(
                x.astype(model.dtype), t, text, mask, pooled, guidance=guidance,
                attn_cfg=attn_cfg, routing_mode=routing_mode,
                interpret=interpret, sp_axis="sp", mm_precision=mm, act_scales=act_scales,
                quantized_blocks=qb,
                step_cache=caches[0] if use_cache else None, **ckw,
            )
            if use_cache:
                new_caches = (out.step_cache,)
            v = out.sample.astype(jnp.float32)
            if do_cfg:
                out_u = model(
                    x.astype(model.dtype), t, neg_text, mask, neg_pooled,
                    guidance=guidance, attn_cfg=attn_cfg,
                    routing_mode=routing_mode, interpret=interpret, sp_axis="sp",
                    mm_precision=mm, act_scales=act_scales,
                    quantized_blocks=qb,
                    step_cache=caches[1] if use_cache else None, **ckw,
                )
                if use_cache:
                    new_caches = new_caches + (out_u.step_cache,)
                vu = out_u.sample.astype(jnp.float32)
                v = vu + cfg_scale * (v - vu)
            return v, new_caches

        from ..ops.stepcache import StepCache as _SC, init_step_cache

        cache_spec = _SC(prev_ind=P(), residual=P(None, "sp"), acc=P(), valid=P())
        n_arms = (1 if not do_cfg else 2) if use_cache else 0
        cache_specs = (cache_spec,) * n_arms

        qb_specs = jax.tree.map(lambda _: P(), qblocks) if qblocks is not None else None
        smapped = shard_map(
            velocity_fn, mesh=mesh,
            in_specs=(P(), P(None, "sp"), P(), P(), P(), P(), P(), P(),
                      cache_specs, P(), qb_specs),
            out_specs=(P(None, "sp"), cache_specs),
            check_vma=False,
        )

        def run_sp(model, latents, text, mask, pooled, neg_text, neg_pooled):
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
                    c = init_step_cache(nb, seq, cfg.dim, cfg.dim,
                                        self.model.dtype)
                    return _SC(*(jax.device_put(a, NamedSharding(mesh, s))
                                 for a, s in zip(c, cache_spec)))

                caches0 = tuple(mk(b0) for _ in range(n_arms))

            @jax.jit
            def loop(state, latents, text, mask, pooled, neg_text, neg_pooled,
                     caches0):
                def body(carry, i):
                    x, m_prev, m_prev2, x_prev, caches = carry
                    t = jnp.full((x.shape[0],), timesteps[i])
                    force = (i < cache_warmup) | (i == n_steps - 1)
                    v, new_caches = smapped(
                        state, x, text, mask, pooled, neg_text, neg_pooled, t,
                        caches, force, qblocks,
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

            return loop(state, latents, text, mask, pooled, neg_text,
                        neg_pooled, caches0)

        return run_sp

    def decode(self, latents: jax.Array, tiled: bool = False,
               tile_latent=(16, 32, 32), overlap_latent=(4, 8, 8)) -> jax.Array:
        """Latents -> pixels via the attached VAE (reference decode stage:
        pipeline_hunyuan.py:460-463; tiling: scripts/hunyuan/inference.py:100)."""
        if self.vae is None:
            raise ValueError("pipeline constructed without a VAE")
        z = self.vae.denormalize_latents(latents)
        if tiled:
            from ..models.vae_tiling import tiled_decode

            return tiled_decode(
                lambda zz: self.vae.decode(zz, denormalize=False),
                z, tile_latent=tile_latent, overlap_latent=overlap_latent,
            )
        return self.vae.decode(z, denormalize=False)

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
