"""Wan 2.1 video Diffusion Transformer — native Flax NNX implementation.

Architecture mirrors diffusers' WanTransformer3DModel (which the reference
monkey-patches rather than owns — vorta/patch/modeling_wan.py) so torch
checkpoints import 1:1, but the implementation is TPU-first:

  * channels-last latents (B, T, H, W, C) feeding an NDHWC patchify conv
  * blocks are stacked (nnx.vmap at init) and iterated with nnx.scan —
    one block's HLO compiled once regardless of depth
  * self-attention routes between the three sparse experts as a first-class
    config (routing: off | soft | hard), not a processor monkey-patch
  * the training teacher pass (frozen full-attention stream) runs inside the
    same scan carry (reference: modeling_wan.py:107-150)

RoPE tables and attention geometry are static functions of the latent grid,
precomputed host-side at trace time.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..config import AttentionConfig, WanModelConfig
from ..ops.qmm import QLinear
from ..ops.experts import full_attention, padded_dense_attention, routed_attention
from ..ops.rope import rope_cos_sin
from .common import (
    FP32LayerNorm,
    GELUFeedForward,
    RMSNorm,
    TextProjection,
    TimestepEmbedding,
    sinusoidal_timestep_embedding,
)
from .router import Router


@dataclasses.dataclass
class WanOutput:
    sample: jax.Array  # (B, T, H, W, C) latent-space prediction
    reg_loss: Optional[jax.Array] = None
    last_layer_distill_loss: Optional[jax.Array] = None
    hidden_layer_distill_loss: Optional[jax.Array] = None
    routing_scores: Optional[jax.Array] = None  # (L, B, H, E)
    mm_calibration: Optional[dict] = None  # {site: (L,) amax} (calibrate_mm)
    step_cache: Optional[object] = None  # ops.stepcache.StepCache (serving)
    hidden_delta: Optional[jax.Array] = None  # block-stack out - in (B,S,D)
    temb_indicator: Optional[jax.Array] = None  # (B, 6*dim) cache indicator


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    b, s, _ = x.shape
    return x.reshape(b, s, num_heads, -1).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


class WanSelfAttention(nnx.Module):
    """Routed self-attention (reference attn1 + TripleTrain/Eval processors)."""

    def __init__(self, cfg: WanModelConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        dim = cfg.dim
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.num_heads = cfg.num_heads
        # QLinear == nnx.Linear params; obeys the opt-in int8 mm context
        self.to_q = QLinear(dim, dim, use_bias=True, site="attn1.to_q", **kw)
        self.to_k = QLinear(dim, dim, use_bias=True, site="attn1.to_k", **kw)
        self.to_v = QLinear(dim, dim, use_bias=True, site="attn1.to_v", **kw)
        self.to_out = QLinear(dim, dim, use_bias=True, site="attn1.to_out", **kw)
        self.norm_q = RMSNorm(dim, cfg.eps, rngs=rngs) if cfg.qk_norm else None
        self.norm_k = RMSNorm(dim, cfg.eps, rngs=rngs) if cfg.qk_norm else None

    def __call__(
        self,
        x: jax.Array,
        rope: Tuple[jax.Array, jax.Array],
        attn_cfg: AttentionConfig,
        scores: Optional[jax.Array],
        routing_mode: str,
        interpret: bool = False,
        sp_axis: Optional[str] = None,
    ) -> jax.Array:
        from ..ops.prologue import fused_qk_prologue, use_fused_prologue
        from ..ops.qmm import fused_linear
        from ..ops.rope import apply_rope_half

        # one concatenated qkv matmul (fewer launches; int8 quantizes x once)
        q, k, v = fused_linear(x, (self.to_q, self.to_k, self.to_v))
        cos, sin = rope  # local slices when sequence-parallel
        # contiguous-half RoPE: to_q/to_k columns (and qk-norm gains) are in
        # the half-permuted layout — see ops/rope.py permute_qk_to_half
        if use_fused_prologue(routing_mode, q.shape[1], q.shape[-1], self.num_heads):
            # inference: one fused Pallas pass for qk-norm + half-RoPE +
            # head split (no VJP; the soft-routing training path keeps the
            # differentiable XLA ops below)
            q, k, v = fused_qk_prologue(
                q, k, v,
                self.norm_q.weight.value if self.norm_q is not None else None,
                self.norm_k.weight.value if self.norm_k is not None else None,
                cos, sin,
                num_heads=self.num_heads,
                eps=self.norm_q.eps if self.norm_q is not None else 1e-6,
                qk_norm=self.norm_q is not None,
                interpret=interpret,
            )
        else:
            if self.norm_q is not None:
                q = self.norm_q(q)
                k = self.norm_k(k)
            q = _split_heads(q, self.num_heads)
            k = _split_heads(k, self.num_heads)
            v = _split_heads(v, self.num_heads)
            q = apply_rope_half(q, cos, sin)
            k = apply_rope_half(k, cos, sin)

        if sp_axis is not None:
            # Ulysses reshard: full sequence, 1/P of the heads per rank
            from ..parallel.ulysses import (
                all_to_all_heads_to_seq,
                all_to_all_seq_to_heads,
                slice_local,
            )

            q = all_to_all_heads_to_seq(q, sp_axis)
            k = all_to_all_heads_to_seq(k, sp_axis)
            v = all_to_all_heads_to_seq(v, sp_axis)
            if scores is not None:
                scores = slice_local(scores, dim=1, axis=sp_axis)

        if routing_mode == "off":
            out = full_attention(q, k, v, attn_cfg, interpret=interpret)
        else:
            out = routed_attention(
                q, k, v, scores, attn_cfg, mode=routing_mode, interpret=interpret
            )

        if sp_axis is not None:
            from ..parallel.ulysses import all_to_all_seq_to_heads

            out = all_to_all_seq_to_heads(out, sp_axis)
        return self.to_out(_merge_heads(out))


class WanCrossAttention(nnx.Module):
    """Cross-attention to the projected text sequence (reference attn2).

    The optional image branch (I2V: first 257 encoder tokens through
    add_k/v_proj — reference wan.py:72-75,119-139) attends separately and is
    summed into the output.
    """

    def __init__(self, cfg: WanModelConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        dim = cfg.dim
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.num_heads = cfg.num_heads
        # video-length matmuls (q, out) obey the int8 mm context; the text
        # k/v projections are sequence-512 — negligible, kept bf16
        self.to_q = QLinear(dim, dim, use_bias=True, site="attn2.to_q", **kw)
        self.to_k = nnx.Linear(dim, dim, use_bias=True, **kw)
        self.to_v = nnx.Linear(dim, dim, use_bias=True, **kw)
        self.to_out = QLinear(dim, dim, use_bias=True, site="attn2.to_out", **kw)
        self.norm_q = RMSNorm(dim, cfg.eps, rngs=rngs) if cfg.qk_norm else None
        self.norm_k = RMSNorm(dim, cfg.eps, rngs=rngs) if cfg.qk_norm else None
        if cfg.image_dim is not None:
            self.add_k_proj = nnx.Linear(dim, dim, use_bias=True, **kw)
            self.add_v_proj = nnx.Linear(dim, dim, use_bias=True, **kw)
            self.norm_added_k = RMSNorm(dim, cfg.eps, rngs=rngs)
        else:
            self.add_k_proj = None

    def __call__(
        self,
        x: jax.Array,
        context: jax.Array,
        image_context: Optional[jax.Array] = None,
        interpret: bool = False,
    ) -> jax.Array:
        q = self.to_q(x)
        if self.norm_q is not None:
            q = self.norm_q(q)
        k = self.to_k(context)
        if self.norm_k is not None:
            k = self.norm_k(k)
        v = self.to_v(context)
        qh = _split_heads(q, self.num_heads)
        out = padded_dense_attention(
            qh,
            _split_heads(k, self.num_heads),
            _split_heads(v, self.num_heads),
            interpret=interpret,
        )
        if image_context is not None and self.add_k_proj is not None:
            ki = self.norm_added_k(self.add_k_proj(image_context))
            vi = self.add_v_proj(image_context)
            out_img = padded_dense_attention(
                qh,
                _split_heads(ki, self.num_heads),
                _split_heads(vi, self.num_heads),
                interpret=interpret,
            )
            out = out + out_img
        return self.to_out(_merge_heads(out))


class WanBlock(nnx.Module):
    """AdaLN-modulated DiT block (reference wan_block_routed_forward)."""

    def __init__(self, cfg: WanModelConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        dim = cfg.dim
        self.norm1 = FP32LayerNorm(dim, cfg.eps, affine=False, rngs=rngs)
        self.attn1 = WanSelfAttention(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.attn2 = WanCrossAttention(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm2 = (
            FP32LayerNorm(dim, cfg.eps, affine=True, rngs=rngs)
            if cfg.cross_attn_norm
            else FP32LayerNorm(dim, cfg.eps, affine=False, rngs=rngs)
        )
        self.norm3 = FP32LayerNorm(dim, cfg.eps, affine=False, rngs=rngs)
        self.ffn = GELUFeedForward(dim, cfg.ffn_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs, site_prefix="ffn")
        self.scale_shift_table = nnx.Param(
            jax.random.normal(rngs.params(), (1, 6, dim), jnp.float32) / dim**0.5
        )
        self.router = Router(dim, cfg.num_heads, rngs=rngs)

    def __call__(
        self,
        x: jax.Array,
        context: jax.Array,
        temb6: jax.Array,  # (B, 6, dim) f32
        temb_raw: jax.Array,  # (B, dim) — router input, pre-projection
        rope: Tuple[jax.Array, jax.Array],
        attn_cfg: AttentionConfig,
        routing_mode: str,
        image_context: Optional[jax.Array] = None,
        interpret: bool = False,
        sp_axis: Optional[str] = None,
    ):
        mod = self.scale_shift_table[...] + temb6.astype(jnp.float32)
        gate_msa, c_gate = mod[:, 2][:, None, :], mod[:, 5][:, None, :]

        scores = None
        if routing_mode != "off":
            scores = self.router(temb_raw)

        norm_x = self.norm1.modulated(x, mod[:, 1], mod[:, 0])
        attn_out = self.attn1(
            norm_x, rope, attn_cfg, scores, routing_mode, interpret, sp_axis
        )
        # residual adds stay in XLA: wiring ops.fused_norm.fused_residual_norm
        # here measured ~1% SLOWER e2e (kernel boundaries break the
        # producer/consumer fusions XLA builds around the adds)
        x = (x.astype(jnp.float32) + attn_out.astype(jnp.float32) * gate_msa).astype(x.dtype)

        norm_x = self.norm2(x)
        x = x + self.attn2(norm_x, context, image_context, interpret)

        norm_x = self.norm3.modulated(x, mod[:, 4], mod[:, 3])
        ff_out = self.ffn(norm_x)
        x = (x.astype(jnp.float32) + ff_out.astype(jnp.float32) * c_gate).astype(x.dtype)
        return x, scores


class WanImageEmbedding(nnx.Module):
    """CLIP image-embed projection for I2V (diffusers WanImageEmbedding):
    FP32LayerNorm(in) -> FF(in -> dim, mult=1) -> FP32LayerNorm(dim).

    diffusers' FeedForward(activation_fn="gelu") is the EXACT gelu — only
    the text embedder's "gelu_tanh" is the approximate one — and its
    FP32LayerNorms keep torch's default eps=1e-5 (the block norms use the
    model's 1e-6)."""

    def __init__(self, in_dim: int, dim: int, *, dtype, param_dtype, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm1 = FP32LayerNorm(in_dim, 1e-5, affine=True, rngs=rngs)
        self.proj_in = nnx.Linear(in_dim, in_dim, **kw)
        self.proj_out = nnx.Linear(in_dim, dim, **kw)
        self.norm2 = FP32LayerNorm(dim, 1e-5, affine=True, rngs=rngs)

    def __call__(self, image_embeds: jax.Array) -> jax.Array:
        h = self.norm1(image_embeds)
        h = self.proj_out(jax.nn.gelu(self.proj_in(h), approximate=False))
        return self.norm2(h)


class WanConditionEmbedder(nnx.Module):
    """Timestep + text (+ image) conditioning (diffusers WanTimeTextImageEmbedding)."""

    def __init__(self, cfg: WanModelConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        self.freq_dim = cfg.freq_dim
        self.time_embedder = TimestepEmbedding(
            cfg.freq_dim, cfg.dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )
        self.time_proj = nnx.Linear(
            cfg.dim, cfg.dim * 6, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )
        self.text_embedder = TextProjection(
            cfg.text_dim, cfg.dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )
        self.image_embedder = (
            WanImageEmbedding(cfg.image_dim, cfg.dim, dtype=dtype,
                              param_dtype=param_dtype, rngs=rngs)
            if cfg.image_dim is not None
            else None
        )

    def __call__(self, timestep: jax.Array, context: jax.Array,
                 image_embeds: Optional[jax.Array] = None):
        sin_emb = sinusoidal_timestep_embedding(timestep, self.freq_dim)
        temb = self.time_embedder(sin_emb)  # (B, dim)
        temb6 = self.time_proj(jax.nn.silu(temb))
        temb6 = temb6.reshape(temb.shape[0], 6, -1)
        ctx = self.text_embedder(context)
        img = None
        if image_embeds is not None and self.image_embedder is not None:
            img = self.image_embedder(image_embeds)
        return temb, temb6, ctx, img


class WanModel(nnx.Module):
    """WanTransformer3DModel, channels-last, scan-over-blocks."""

    def __init__(
        self,
        cfg: WanModelConfig,
        *,
        dtype=jnp.float32,
        param_dtype=jnp.float32,
        rngs: nnx.Rngs,
    ):
        self.cfg = cfg
        self.dtype = dtype
        self.patch_embedding = nnx.Conv(
            cfg.in_channels,
            cfg.dim,
            kernel_size=cfg.patch_size,
            strides=cfg.patch_size,
            padding="VALID",
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )
        self.condition_embedder = WanConditionEmbedder(
            cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )

        @nnx.split_rngs(splits=cfg.num_layers)
        @nnx.vmap(in_axes=(0,), out_axes=0)
        def create_block(block_rngs: nnx.Rngs):
            return WanBlock(cfg, dtype=dtype, param_dtype=param_dtype, rngs=block_rngs)

        self.blocks = create_block(rngs)
        self.norm_out = FP32LayerNorm(cfg.dim, cfg.eps, affine=False, rngs=rngs)
        self.proj_out = nnx.Linear(
            cfg.dim,
            cfg.out_channels * int(np.prod(cfg.patch_size)),
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )
        self.scale_shift_table = nnx.Param(
            jax.random.normal(rngs.params(), (1, 2, cfg.dim), jnp.float32) / cfg.dim**0.5
        )

    def _rope(self, grid: Tuple[int, int, int]):
        cos, sin = rope_cos_sin(grid, self.cfg.head_dim, self.cfg.rope_theta)
        return jnp.asarray(cos), jnp.asarray(sin)

    def __call__(self, *args, mm_precision: str = "bf16", **kwargs) -> WanOutput:
        """See _forward.  ``mm_precision="int8"`` activates the dynamic W8A8
        path (ops/qmm.py) for the block FFN/attention projections — an
        opt-in serving mode; default bf16 is bit-identical to before."""
        from ..ops.qmm import mm_precision as _mm_scope

        with _mm_scope(mm_precision):
            return self._forward(*args, **kwargs)

    def _forward(
        self,
        latents: jax.Array,  # (B, T, H, W, C_in) channels-last
        timestep: jax.Array,  # (B,)
        context: jax.Array,  # (B, L, text_dim)
        attn_cfg: Optional[AttentionConfig] = None,
        routing_mode: str = "off",
        image_context: Optional[jax.Array] = None,
        return_losses: bool = False,
        return_scores: bool = False,
        interpret: bool = False,
        sp_axis: Optional[str] = None,
        frozen_sharded_axis: Optional[str] = None,
        remat_blocks: bool = False,
        quantized_blocks=None,
        act_scales: Optional[dict] = None,
        calibrate_mm: bool = False,
        step_cache=None,  # ops.stepcache.StepCache from the previous step
        cache_threshold: float = 0.0,
        cache_force_compute: Optional[jax.Array] = None,  # () bool
        cache_coefficients=None,
        return_hidden_delta: bool = False,  # tools/fit_cache_poly.py probe
    ) -> WanOutput:
        """Forward.  With ``sp_axis`` set (inside shard_map over that mesh
        axis), ``latents`` hold this rank's contiguous latent-frame chunk and
        ``attn_cfg.latent_shape`` is the GLOBAL token grid; conditioning
        inputs are replicated.  The output is the rank-local frame chunk.

        ``frozen_sharded_axis``: FSDP-style fallback for DiTs whose frozen
        weights do not fit replicated (the reference FSDP-shards the frozen
        13-14B model — train/fsdp_utils.py).  The stacked per-block FROZEN
        params arrive layer-sharded over that mesh axis (each rank holds
        num_layers/P blocks); the block loop fetches one block per step with
        a psum broadcast from its owner, so peak per-chip weight memory is
        (params/P + one block) instead of all params.  Router params (tiny)
        stay replicated.

        ``quantized_blocks``: single-chip analog for models that exceed one
        chip's HBM even alone (Wan-14B, 28 GB bf16 > 16 GB v5e): a stacked
        block-state pytree whose large weights are ops/quant.QTensor
        (int4/int8); the scan dequantizes ONE block per step, so peak HBM is
        quantized stack + one bf16 block.  Replaces the reference's model
        CPU offload (scripts/wan/inference.py:156-162).  Overrides
        ``self.blocks``'s own (typically depth-1 placeholder) state; the
        scan length comes from the quantized stack's leading dim."""
        cfg = self.cfg
        b, t_px, h_px, w_px, _ = latents.shape
        pt, ph, pw = cfg.patch_size
        sp_size = 1 if sp_axis is None else jax.lax.axis_size(sp_axis)
        grid = (sp_size * (t_px // pt), h_px // ph, w_px // pw)
        if attn_cfg is None:
            attn_cfg = AttentionConfig(latent_shape=grid, sta_tile=grid)
        elif attn_cfg.latent_shape != grid:
            raise ValueError(
                f"attention config latent_shape {attn_cfg.latent_shape} != global token grid {grid}"
            )

        x = self.patch_embedding(latents.astype(self.dtype))
        x = x.reshape(b, -1, cfg.dim)

        temb, temb6, ctx, img_ctx = self.condition_embedder(
            timestep, context.astype(self.dtype), image_context
        )
        image_context = img_ctx if img_ctx is not None else image_context
        rope = self._rope(grid)
        if sp_axis is not None:
            # this rank's contiguous rows of the global RoPE tables
            # (SP-aware RoPE, reference: modeling_wan.py:242-262)
            from ..parallel.ulysses import slice_local

            rope = tuple(slice_local(r, dim=0, axis=sp_axis) for r in rope)

        if return_losses and routing_mode == "off":
            raise ValueError("return_losses requires routed attention")

        teacher = return_losses

        # scan over stacked block params with manual split/merge: unlike
        # nnx.scan this composes under any outer transform (plain jit,
        # shard_map, grad) because the merged module lives entirely inside
        # the scan-body trace
        if frozen_sharded_axis is not None:
            from ..parallel.fsdp import sharded_block_fetcher

            router_filter = nnx.All(nnx.Param, nnx.PathContains("router"))
            block_graphdef, router_bs, frozen_bs = nnx.split(
                self.blocks, router_filter, ...
            )
            block_at = sharded_block_fetcher(
                block_graphdef, router_bs, frozen_bs,
                cfg.num_layers, frozen_sharded_axis,
            )
        else:
            block_graphdef, block_state = nnx.split(self.blocks)

        # static int8 activation scales / calibration (ops/qmm.py): scales
        # ride scan_xs so each block sees its own per-layer slice; recorded
        # amaxes leave through the scan ys stacked per layer
        from ..ops import qmm

        scales_xs = (
            {k: jnp.asarray(v, jnp.float32) for k, v in act_scales.items()}
            if act_scales
            else None
        )

        def run_block(carry, scan_in):
            bstate, layer_scales = scan_in
            if frozen_sharded_axis is not None:
                block: WanBlock = block_at(bstate)  # bstate is the layer index
            else:
                if quantized_blocks is not None:
                    from ..ops.quant import dequantize_tree

                    bstate = dequantize_tree(bstate)
                block: WanBlock = nnx.merge(block_graphdef, bstate)
            xs, xt, reg, hid = carry
            import contextlib as _cl

            scale_scope = (
                qmm.layer_act_scales(layer_scales)
                if layer_scales is not None
                else _cl.nullcontext()
            )
            calib_sink: dict = {}
            with scale_scope:
                if calibrate_mm:
                    with qmm.calibration_scope() as calib_sink:
                        xs, scores = block(
                            xs, ctx, temb6, temb, rope, attn_cfg, routing_mode,
                            image_context=image_context, interpret=interpret,
                            sp_axis=sp_axis,
                        )
                else:
                    xs, scores = block(
                        xs, ctx, temb6, temb, rope, attn_cfg, routing_mode,
                        image_context=image_context, interpret=interpret,
                        sp_axis=sp_axis,
                    )
            if teacher:
                xt_new, _ = block(
                    xt, ctx, temb6, temb, rope, attn_cfg, "off",
                    image_context=image_context, interpret=interpret, sp_axis=sp_axis,
                )
                xt = jax.lax.stop_gradient(xt_new)
                # L2 regularization on the full-attention routing weight
                # (reference: modeling_wan.py:117,145)
                reg = reg + jnp.mean(jnp.square(scores[:, :, 0]))
                hid = hid + jnp.mean(
                    jnp.square(xt.astype(jnp.float32) - xs.astype(jnp.float32))
                )
            if scores is None:
                scores = jnp.zeros((b, cfg.num_heads, attn_cfg.num_experts), jnp.float32)
            return (xs, xt, reg, hid), (scores, calib_sink)

        if remat_blocks:
            # gradient checkpointing per block: without it the scan saves
            # every layer's expert outputs in f32 for backward (~17 GB at
            # 480p x 77f teacher+student — exceeds a v5e's HBM).  Reference
            # analogue: per-block activation checkpointing in train.py.
            run_block = jax.checkpoint(run_block, prevent_cse=False)
        zero = jnp.zeros((), jnp.float32)
        if frozen_sharded_axis is not None:
            scan_xs = jnp.arange(cfg.num_layers)
        elif quantized_blocks is not None:
            scan_xs = quantized_blocks
        else:
            scan_xs = block_state

        def scan_blocks(xin):
            return jax.lax.scan(
                run_block, (xin, xin, zero, zero), (scan_xs, scales_xs)
            )

        new_cache = None
        x_stack_in = x
        if step_cache is None:
            (x, x_t, reg_loss, hidden_loss), (all_scores, mm_amax) = scan_blocks(x)
        else:
            # step-residual caching (ops/stepcache.py): a traced cond either
            # runs the block stack or replays the cached block delta —
            # patch embed + head still run, so the integrator keeps its
            # identity path through the current latents (TeaCache semantics)
            if teacher or calibrate_mm:
                raise ValueError(
                    "step caching is a serving mode: incompatible with "
                    "return_losses / calibrate_mm"
                )
            from ..ops.stepcache import StepCache, cache_decision

            n_layers = jax.tree.leaves(scan_xs)[0].shape[0]
            ind = temb6.reshape(b, -1).astype(jnp.float32)
            skip, acc_skip = cache_decision(
                step_cache, ind, cache_threshold, cache_force_compute,
                cache_coefficients,
            )

            def compute_branch(cache):
                (xo, _, _, _), (scores, _) = scan_blocks(x)
                return xo, scores, StepCache(
                    prev_ind=ind,
                    residual=(xo - x).astype(x.dtype),
                    acc=jnp.zeros((), jnp.float32),
                    valid=jnp.ones((), bool),
                )

            def skip_branch(cache):
                xo = x + cache.residual.astype(x.dtype)
                scores = jnp.zeros(
                    (n_layers, b, cfg.num_heads, attn_cfg.num_experts),
                    jnp.float32,
                )
                return xo, scores, StepCache(
                    prev_ind=ind, residual=cache.residual, acc=acc_skip,
                    valid=cache.valid,
                )

            x, all_scores, new_cache = jax.lax.cond(
                skip, skip_branch, compute_branch, step_cache
            )
            x_t, reg_loss, hidden_loss, mm_amax = x, zero, zero, {}

        # output head
        def head(hx):
            mod = self.scale_shift_table[...] + temb.astype(jnp.float32)[:, None, :]
            out = self.norm_out.modulated(hx, mod[:, 1], mod[:, 0])
            return self.proj_out(out)

        out = head(x)
        last_loss = None
        if teacher:
            out_t = jax.lax.stop_gradient(head(x_t))
            last_loss = jnp.mean(
                jnp.square(out_t.astype(jnp.float32) - out.astype(jnp.float32))
            )

        local_grid = (t_px // pt, h_px // ph, w_px // pw)
        sample = self._unpatchify(out, b, local_grid)
        # reg/hidden losses are sums over layers, matching the reference's
        # accumulate_loss (vorta/utils/misc.py:91-92)
        return WanOutput(
            sample=sample,
            reg_loss=reg_loss if teacher else None,
            last_layer_distill_loss=last_loss,
            hidden_layer_distill_loss=hidden_loss if teacher else None,
            routing_scores=all_scores if return_scores else None,
            mm_calibration=mm_amax if calibrate_mm else None,
            step_cache=new_cache,
            hidden_delta=(x - x_stack_in) if return_hidden_delta else None,
            temb_indicator=(
                temb6.reshape(b, -1).astype(jnp.float32)
                if return_hidden_delta else None
            ),
        )

    def _unpatchify(self, out: jax.Array, b: int, grid: Tuple[int, int, int]) -> jax.Array:
        cfg = self.cfg
        t, h, w = grid
        pt, ph, pw = cfg.patch_size
        c = cfg.out_channels
        out = out.reshape(b, t, h, w, pt, ph, pw, c)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        return out.reshape(b, t * pt, h * ph, w * pw, c)
