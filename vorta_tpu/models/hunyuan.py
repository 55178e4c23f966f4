"""HunyuanVideo MMDiT — native Flax NNX implementation.

Mirrors diffusers' HunyuanVideoTransformer3DModel (which the reference
monkey-patches: vorta/patch/modeling_hunyuan.py): 20 dual-stream blocks
(separate video/text streams, joint attention) followed by 40 single-stream
blocks (concatenated sequence, parallel attention+MLP), llama text states
refined by a timestep-conditioned token refiner, CLIP pooled + guidance
embeddings added to the timestep conditioning, per-head RMS qk-norm, and
(16, 56, 56) axis-split RoPE at theta=256 on the video tokens only.

TPU-first specifics: channels-last latents, stacked blocks scanned with
manual split/merge (compiles one block body per stream type), routed sparse
attention over the joint sequence via ops/joint_experts (per-prompt text
padding rides an additive kv-bias), teacher distillation streams in the scan
carries.

NOTE on fidelity: the token-refiner forward is pinned against an independent
torch oracle built on torch.nn.MultiheadAttention (masked pooling, sinusoid
convention, attention, tanh-gelu FFN, padding-mask semantics —
tests/test_real_transformers_parity.py), and the full diffusers checkpoint
key layout is validated by io/torch_import.validate_hunyuan_checkpoint_keys;
only the gate CHUNK ORDER (attn, mlp) remains pinned to our own reading of
diffusers (modeling_hunyuan.py:621-645) pending real weights.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..config import AttentionConfig
from ..ops.attention_ref import attention_dense
from ..ops.joint_experts import JointConfig, routed_joint_attention
from ..ops.rope import apply_rope_half
from ..ops.qmm import QLinear
from .common import FP32LayerNorm, GELUFeedForward, TimestepEmbedding, sinusoidal_timestep_embedding
from .router import Router

Shape3 = Tuple[int, int, int]


@dataclasses.dataclass(frozen=True)
class HunyuanModelConfig:
    dim: int = 3072
    num_heads: int = 24
    head_dim: int = 128
    dual_layers: int = 20
    single_layers: int = 40
    mlp_ratio: float = 4.0
    in_channels: int = 16
    out_channels: int = 16
    patch_size: Shape3 = (1, 2, 2)
    text_dim: int = 4096
    text_len: int = 256
    pooled_dim: int = 768
    rope_axes: Shape3 = (16, 56, 56)
    rope_theta: float = 256.0
    guidance_embeds: bool = True
    refiner_layers: int = 2
    freq_dim: int = 256
    eps: float = 1e-6
    # I2V token-replace variant: first-frame tokens carry the clean image and
    # get t=0 AdaLN conditioning (reference: modeling_hunyuan.py:633-641 and
    # the token_replace_emb threading through every block, :264-341)
    image_condition_type: Optional[str] = None  # None | "token_replace"

    def __post_init__(self):
        if self.dim != self.num_heads * self.head_dim:
            raise ValueError("dim != num_heads * head_dim")
        if sum(self.rope_axes) != self.head_dim:
            raise ValueError("rope axes must sum to head_dim")


def _first_frame_mask(x, first_frame_tokens: int, sp_axis):
    """(1, local_S, 1) bool: which local video tokens belong to the first
    latent frame.  SP-safe: ranks hold contiguous frame chunks, so the
    global position is rank * local_len + i (the reference computes this
    only for the unsharded case — its SP + token-replace combination would
    mis-condition ranks > 0)."""
    s_local = x.shape[1]
    pos = jnp.arange(s_local)
    if sp_axis is not None:
        pos = pos + jax.lax.axis_index(sp_axis) * s_local
    return (pos < first_frame_tokens)[None, :, None]


HUNYUAN_13B = HunyuanModelConfig()
HUNYUAN_TINY = HunyuanModelConfig(
    dim=128, num_heads=2, head_dim=64, dual_layers=2, single_layers=2,
    text_dim=48, text_len=24, pooled_dim=32, rope_axes=(16, 24, 24),
    freq_dim=32, refiner_layers=1,
)


@dataclasses.dataclass
class HunyuanOutput:
    sample: jax.Array
    reg_loss: Optional[jax.Array] = None
    last_layer_distill_loss: Optional[jax.Array] = None
    hidden_layer_distill_loss: Optional[jax.Array] = None
    routing_scores: Optional[jax.Array] = None  # (L_total, B, H, E)
    mm_calibration: Optional[dict] = None  # {site: (L,) amax} (calibrate_mm)
    step_cache: Optional[object] = None  # ops.stepcache.StepCache (serving)


def hunyuan_rope_tables(grid: Shape3, cfg: HunyuanModelConfig):
    """Axis-split angles: rope_axes give REAL dims per axis (complex = /2)."""
    t, h, w = grid
    counts = [d // 2 for d in cfg.rope_axes]
    parts = []
    for n, c, ax in zip(grid, counts, range(3)):
        k = np.arange(c, dtype=np.float64)
        inv = cfg.rope_theta ** (-k / c)
        ang = np.outer(np.arange(n, dtype=np.float64), inv)
        shape = [1, 1, 1, c]
        shape[ax] = n
        parts.append(np.broadcast_to(ang.reshape(shape), (t, h, w, c)))
    angles = np.concatenate(parts, axis=-1).reshape(t * h * w, sum(counts))
    return jnp.asarray(np.cos(angles), jnp.float32), jnp.asarray(np.sin(angles), jnp.float32)


class PerHeadRMSNorm(nnx.Module):
    """RMSNorm over head_dim, applied to (B, H, S, D) (qk_norm='rms_norm')."""

    def __init__(self, head_dim: int, eps: float, *, rngs: nnx.Rngs):
        self.eps = eps
        self.weight = nnx.Param(jnp.ones((head_dim,), jnp.float32))

    def __call__(self, x: jax.Array) -> jax.Array:
        xf = x.astype(jnp.float32)
        rms = jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + self.eps)
        return (xf * rms * self.weight[None, None, None, :]).astype(x.dtype)


class AdaLNModulation(nnx.Module):
    """SiLU -> Linear(dim, n*dim); diffusers AdaLayerNormZero(.Single) core."""

    def __init__(self, dim: int, n: int, *, dtype, param_dtype, rngs: nnx.Rngs):
        self.n = n
        self.linear = nnx.Linear(dim, n * dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, temb: jax.Array):
        out = self.linear(jax.nn.silu(temb)).astype(jnp.float32)
        return jnp.split(out, self.n, axis=-1)


def _split_heads(x, h):
    b, s, _ = x.shape
    return x.reshape(b, s, h, -1).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def _sp_joint_in(qv, kv_, vv, qt, kt, vt, scores, sp_axis):
    """Ulysses reshard for joint attention: video q/k/v flip seq-shard ->
    head-shard (full sequence per rank), replicated text q/k/v and routing
    scores slice to the rank's local heads (reference choreography:
    vorta/attention/hunyuan.py:153-187, via lax.all_to_all instead of NCCL)."""
    from ..parallel.ulysses import all_to_all_heads_to_seq, slice_local

    qv = all_to_all_heads_to_seq(qv, sp_axis)
    kv_ = all_to_all_heads_to_seq(kv_, sp_axis)
    vv = all_to_all_heads_to_seq(vv, sp_axis)
    qt = slice_local(qt, dim=1, axis=sp_axis)
    kt = slice_local(kt, dim=1, axis=sp_axis)
    vt = slice_local(vt, dim=1, axis=sp_axis)
    if scores is not None:
        scores = slice_local(scores, dim=1, axis=sp_axis)
    return qv, kv_, vv, qt, kt, vt, scores


def _sp_joint_out(video, text, sp_axis):
    """Inverse reshard: video back to (all heads, local frames); text output
    all-gathered over the head axis so every rank holds the full text stream
    (reference: vorta/attention/hunyuan.py:186-187)."""
    from ..parallel.ulysses import all_to_all_seq_to_heads, gather_sequence

    video = all_to_all_seq_to_heads(video, sp_axis)
    text = gather_sequence(text, seq_axis=1, axis=sp_axis)  # head axis
    return video, text


class HunyuanJointAttention(nnx.Module):
    """Dual-stream joint attention (separate text projections)."""

    def __init__(self, cfg: HunyuanModelConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        dim = cfg.dim
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.num_heads = cfg.num_heads
        # video-length projections obey the int8 mm context (ops.qmm);
        # text-side (add_*, to_add_out) are sequence-256 — kept bf16
        self.to_q = QLinear(dim, dim, use_bias=True, site="dual.attn.to_q", **kw)
        self.to_k = QLinear(dim, dim, use_bias=True, site="dual.attn.to_k", **kw)
        self.to_v = QLinear(dim, dim, use_bias=True, site="dual.attn.to_v", **kw)
        self.add_q_proj = nnx.Linear(dim, dim, use_bias=True, **kw)
        self.add_k_proj = nnx.Linear(dim, dim, use_bias=True, **kw)
        self.add_v_proj = nnx.Linear(dim, dim, use_bias=True, **kw)
        self.norm_q = PerHeadRMSNorm(cfg.head_dim, cfg.eps, rngs=rngs)
        self.norm_k = PerHeadRMSNorm(cfg.head_dim, cfg.eps, rngs=rngs)
        self.norm_added_q = PerHeadRMSNorm(cfg.head_dim, cfg.eps, rngs=rngs)
        self.norm_added_k = PerHeadRMSNorm(cfg.head_dim, cfg.eps, rngs=rngs)
        self.to_out = QLinear(dim, dim, use_bias=True, site="dual.attn.to_out", **kw)
        self.to_add_out = nnx.Linear(dim, dim, use_bias=True, **kw)

    def __call__(self, x, ctx, rope, text_mask, jcfg, scores, routing_mode,
                 interpret, sp_axis=None):
        from ..ops.prologue import use_fused_prologue
        from ..ops.qmm import fused_linear

        h = self.num_heads
        # one concatenated qkv matmul over the 100k-token video stream
        qp, kp, vp = fused_linear(x, (self.to_q, self.to_k, self.to_v))
        cos, sin = rope  # local slices when sequence-parallel
        if use_fused_prologue(routing_mode, qp.shape[1], qp.shape[-1], h):
            # per-head RMSNorm + half-RoPE + head split in one Pallas pass
            # (inference; the text stream below is 256 tokens — left unfused)
            from ..ops.prologue import fused_qk_prologue

            qv, kv_, vv = fused_qk_prologue(
                qp, kp, vp,
                jnp.tile(self.norm_q.weight.value, h),
                jnp.tile(self.norm_k.weight.value, h),
                cos, sin, num_heads=h, eps=self.norm_q.eps,
                norm_scope="head", interpret=interpret,
            )
        else:
            qv = self.norm_q(_split_heads(qp, h))
            kv_ = self.norm_k(_split_heads(kp, h))
            vv = _split_heads(vp, h)
            qv = apply_rope_half(qv, cos, sin)
            kv_ = apply_rope_half(kv_, cos, sin)
        qt = self.norm_added_q(_split_heads(self.add_q_proj(ctx), h))
        kt = self.norm_added_k(_split_heads(self.add_k_proj(ctx), h))
        vt = _split_heads(self.add_v_proj(ctx), h)

        if sp_axis is not None:
            qv, kv_, vv, qt, kt, vt, scores = _sp_joint_in(
                qv, kv_, vv, qt, kt, vt, scores, sp_axis
            )
        video, text = routed_joint_attention(
            qv, kv_, vv, qt, kt, vt, scores, text_mask, jcfg,
            mode=routing_mode, interpret=interpret,
        )
        if sp_axis is not None:
            video, text = _sp_joint_out(video, text, sp_axis)
        return self.to_out(_merge_heads(video)), self.to_add_out(_merge_heads(text))


class HunyuanSingleAttention(nnx.Module):
    """Single-stream attention: shared projections over [video|text]."""

    def __init__(self, cfg: HunyuanModelConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        dim = cfg.dim
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.num_heads = cfg.num_heads
        self.to_q = QLinear(dim, dim, use_bias=True, site="single.attn.to_q", **kw)
        self.to_k = QLinear(dim, dim, use_bias=True, site="single.attn.to_k", **kw)
        self.to_v = QLinear(dim, dim, use_bias=True, site="single.attn.to_v", **kw)
        self.norm_q = PerHeadRMSNorm(cfg.head_dim, cfg.eps, rngs=rngs)
        self.norm_k = PerHeadRMSNorm(cfg.head_dim, cfg.eps, rngs=rngs)

    def __call__(self, x_joint, video_len, rope, text_mask, jcfg, scores,
                 routing_mode, interpret, sp_axis=None, qkv=None):
        from ..ops.qmm import fused_linear

        h = self.num_heads
        # ``qkv`` lets the block fuse these projections with its parallel
        # MLP's into one matmul (they all read the same modulated norm)
        if qkv is None:
            qkv = fused_linear(x_joint, (self.to_q, self.to_k, self.to_v))
        qp, kp, vp = qkv
        cos, sin = rope  # local slices when sequence-parallel
        from ..ops.prologue import use_fused_prologue

        if use_fused_prologue(routing_mode, qp.shape[1], qp.shape[-1], h):
            # one fused pass over the whole [video|text] stream: norm applies
            # to every row; RoPE rows past video_len are padded to the
            # identity rotation (cos=1, sin=0), so no block-seam constraint
            from ..ops.prologue import fused_qk_prologue

            text_len = qp.shape[1] - video_len
            cos_j = jnp.concatenate(
                [cos, jnp.ones((text_len, cos.shape[-1]), cos.dtype)]
            )
            sin_j = jnp.concatenate(
                [sin, jnp.zeros((text_len, sin.shape[-1]), sin.dtype)]
            )
            q, k, v = fused_qk_prologue(
                qp, kp, vp,
                jnp.tile(self.norm_q.weight.value, h),
                jnp.tile(self.norm_k.weight.value, h),
                cos_j, sin_j, num_heads=h, eps=self.norm_q.eps,
                norm_scope="head", interpret=interpret,
            )
            qv, qt = q[:, :, :video_len], q[:, :, video_len:]
            kv_, kt = k[:, :, :video_len], k[:, :, video_len:]
            vv, vt = v[:, :, :video_len], v[:, :, video_len:]
        else:
            q = self.norm_q(_split_heads(qp, h))
            k = self.norm_k(_split_heads(kp, h))
            v = _split_heads(vp, h)
            qv, qt = q[:, :, :video_len], q[:, :, video_len:]
            kv_, kt = k[:, :, :video_len], k[:, :, video_len:]
            vv, vt = v[:, :, :video_len], v[:, :, video_len:]
            qv = apply_rope_half(qv, cos, sin)
            kv_ = apply_rope_half(kv_, cos, sin)
        if sp_axis is not None:
            qv, kv_, vv, qt, kt, vt, scores = _sp_joint_in(
                qv, kv_, vv, qt, kt, vt, scores, sp_axis
            )
        video, text = routed_joint_attention(
            qv, kv_, vv, qt, kt, vt, scores, text_mask, jcfg,
            mode=routing_mode, interpret=interpret,
        )
        if sp_axis is not None:
            video, text = _sp_joint_out(video, text, sp_axis)
        return _merge_heads(jnp.concatenate([video, text], axis=2))


class HunyuanDualBlock(nnx.Module):
    def __init__(self, cfg: HunyuanModelConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        dim = cfg.dim
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm1_mod = AdaLNModulation(dim, 6, **kw)
        self.norm1 = FP32LayerNorm(dim, cfg.eps, affine=False, rngs=rngs)
        self.norm1_context_mod = AdaLNModulation(dim, 6, **kw)
        self.norm1_context = FP32LayerNorm(dim, cfg.eps, affine=False, rngs=rngs)
        self.attn = HunyuanJointAttention(cfg, **kw)
        self.norm2 = FP32LayerNorm(dim, cfg.eps, affine=False, rngs=rngs)
        self.norm2_context = FP32LayerNorm(dim, cfg.eps, affine=False, rngs=rngs)
        self.ff = GELUFeedForward(dim, int(dim * cfg.mlp_ratio), site_prefix="dual.ff", **kw)
        self.ff_context = GELUFeedForward(dim, int(dim * cfg.mlp_ratio), **kw)
        self.router = Router(dim, cfg.num_heads, rngs=rngs)

    def __call__(self, x, ctx, temb, clean_temb, rope, text_mask, jcfg,
                 routing_mode, interpret, sp_axis=None,
                 token_replace_emb=None, first_frame_tokens=0):
        sh, sc, gate, sh_mlp, sc_mlp, gate_mlp = self.norm1_mod(temb)
        csh, csc, cgate, csh_mlp, csc_mlp, cgate_mlp = self.norm1_context_mod(temb)
        tr_mask = _first_frame_mask(x, first_frame_tokens, sp_axis) \
            if token_replace_emb is not None else None
        if tr_mask is not None:
            # per-token AdaLN: first-frame tokens conditioned by the t=0
            # embedding (same modulation projection — the reference
            # token-replace block reuses norm1.linear on tr_emb)
            t_sh, t_sc, t_gate, t_sh_mlp, t_sc_mlp, t_gate_mlp = \
                self.norm1_mod(token_replace_emb)

        def mod_video(norm, h, sc_, sh_, tsc, tsh):
            base = norm.modulated(h, sc_, sh_)
            if tr_mask is None:
                return base
            alt = norm.modulated(h, tsc, tsh)
            return jnp.where(tr_mask, alt, base)

        def gate_video(g, tg):
            gg = g[:, None]
            if tr_mask is None:
                return gg
            return jnp.where(tr_mask, tg[:, None], gg)

        scores = None
        if routing_mode not in ("off", "off_ref"):
            scores = self.router(clean_temb)

        norm_x = mod_video(self.norm1, x, sc, sh,
                           t_sc if tr_mask is not None else None,
                           t_sh if tr_mask is not None else None)
        norm_c = self.norm1_context.modulated(ctx, csc, csh)
        attn_x, attn_c = self.attn(
            norm_x, norm_c, rope, text_mask, jcfg, scores, routing_mode,
            interpret, sp_axis,
        )
        g_v = gate_video(gate, t_gate if tr_mask is not None else None)
        x = (x.astype(jnp.float32) + attn_x.astype(jnp.float32) * g_v).astype(x.dtype)
        ctx = (ctx.astype(jnp.float32) + attn_c.astype(jnp.float32) * cgate[:, None]).astype(ctx.dtype)

        norm_x = mod_video(self.norm2, x, sc_mlp, sh_mlp,
                           t_sc_mlp if tr_mask is not None else None,
                           t_sh_mlp if tr_mask is not None else None)
        norm_c = self.norm2_context.modulated(ctx, csc_mlp, csh_mlp)
        g_mlp = gate_video(gate_mlp, t_gate_mlp if tr_mask is not None else None)
        x = (x.astype(jnp.float32) + self.ff(norm_x).astype(jnp.float32) * g_mlp).astype(x.dtype)
        ctx = (ctx.astype(jnp.float32) + self.ff_context(norm_c).astype(jnp.float32) * cgate_mlp[:, None]).astype(ctx.dtype)
        return x, ctx, scores


class HunyuanSingleBlock(nnx.Module):
    def __init__(self, cfg: HunyuanModelConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        dim = cfg.dim
        mlp = int(dim * cfg.mlp_ratio)
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm_mod = AdaLNModulation(dim, 3, **kw)
        self.norm = FP32LayerNorm(dim, cfg.eps, affine=False, rngs=rngs)
        self.attn = HunyuanSingleAttention(cfg, **kw)
        self.proj_mlp = QLinear(dim, mlp, site="single.proj_mlp", **kw)
        self.proj_out = QLinear(dim + mlp, dim, site="single.proj_out", **kw)
        self.router = Router(dim, cfg.num_heads, rngs=rngs)

    def __call__(self, x, ctx, temb, clean_temb, rope, text_mask, jcfg,
                 routing_mode, interpret, sp_axis=None,
                 token_replace_emb=None, first_frame_tokens=0):
        text_len = ctx.shape[1]
        joint = jnp.concatenate([x, ctx], axis=1)
        residual = joint
        sh, sc, gate = self.norm_mod(temb)
        tr_mask = None
        if token_replace_emb is not None:
            t_sh, t_sc, t_gate = self.norm_mod(token_replace_emb)
            m = _first_frame_mask(x, first_frame_tokens, sp_axis)
            tr_mask = jnp.concatenate(
                [m, jnp.zeros((1, text_len, 1), bool)], axis=1
            )  # text tokens always use temb
        norm_j = self.norm.modulated(joint, sc, sh)
        if tr_mask is not None:
            norm_j = jnp.where(tr_mask, self.norm.modulated(joint, t_sc, t_sh),
                               norm_j)
        # parallel attention + MLP share norm_j: fuse all four projections
        # (qkv + mlp-in) into one concatenated matmul
        from ..ops.qmm import fused_linear

        qp, kp, vp, mlp_in = fused_linear(
            norm_j, (self.attn.to_q, self.attn.to_k, self.attn.to_v,
                     self.proj_mlp)
        )
        mlp = jax.nn.gelu(mlp_in, approximate=True)

        scores = None
        if routing_mode not in ("off", "off_ref"):
            scores = self.router(clean_temb)
        attn_out = self.attn(
            norm_j, x.shape[1], rope, text_mask, jcfg, scores, routing_mode,
            interpret, sp_axis, qkv=(qp, kp, vp),
        )
        joint_out = self.proj_out(jnp.concatenate([attn_out, mlp], axis=2))
        g = gate[:, None]
        if tr_mask is not None:
            g = jnp.where(tr_mask, t_gate[:, None], g)
        joint = (residual.astype(jnp.float32) + joint_out.astype(jnp.float32) * g).astype(joint.dtype)
        return joint[:, :-text_len], joint[:, -text_len:], scores


class TokenRefinerBlock(nnx.Module):
    def __init__(self, cfg: HunyuanModelConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        dim = cfg.dim
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.num_heads = cfg.num_heads
        self.norm1 = FP32LayerNorm(dim, cfg.eps, affine=True, rngs=rngs)
        self.to_q = nnx.Linear(dim, dim, use_bias=True, **kw)
        self.to_k = nnx.Linear(dim, dim, use_bias=True, **kw)
        self.to_v = nnx.Linear(dim, dim, use_bias=True, **kw)
        self.to_out = nnx.Linear(dim, dim, use_bias=True, **kw)
        self.norm2 = FP32LayerNorm(dim, cfg.eps, affine=True, rngs=rngs)
        self.ff = GELUFeedForward(dim, int(dim * cfg.mlp_ratio), **kw)
        self.gates = AdaLNModulation(dim, 2, **kw)

    def __call__(self, x, c, mask):
        gate_attn, gate_mlp = self.gates(c)
        norm_x = self.norm1(x)
        q = _split_heads(self.to_q(norm_x), self.num_heads)
        k = _split_heads(self.to_k(norm_x), self.num_heads)
        v = _split_heads(self.to_v(norm_x), self.num_heads)
        attn = attention_dense(q, k, v, mask=mask[:, None, None, :])
        x = (x.astype(jnp.float32) + self.to_out(_merge_heads(attn)).astype(jnp.float32) * gate_attn[:, None]).astype(x.dtype)
        x = (x.astype(jnp.float32) + self.ff(self.norm2(x)).astype(jnp.float32) * gate_mlp[:, None]).astype(x.dtype)
        return x


class TokenRefiner(nnx.Module):
    """Timestep-conditioned refinement of llama text states
    (diffusers HunyuanVideoTokenRefiner)."""

    def __init__(self, cfg: HunyuanModelConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.freq_dim = cfg.freq_dim
        self.proj_in = nnx.Linear(cfg.text_dim, cfg.dim, **kw)
        self.time_embedder = TimestepEmbedding(cfg.freq_dim, cfg.dim, **kw)
        self.text_pool_embedder = nnx.Linear(cfg.text_dim, cfg.dim, **kw)
        self.text_pool_out = nnx.Linear(cfg.dim, cfg.dim, **kw)
        self.blocks = nnx.List(
            [TokenRefinerBlock(cfg, **kw) for _ in range(cfg.refiner_layers)]
        )

    def __call__(self, text_states, timestep, mask):
        t_emb = self.time_embedder(
            sinusoidal_timestep_embedding(timestep, self.freq_dim)
        )
        m = mask.astype(jnp.float32)[:, :, None]
        pooled = jnp.sum(text_states.astype(jnp.float32) * m, axis=1) / jnp.maximum(
            jnp.sum(m, axis=1), 1.0
        )
        pooled_emb = self.text_pool_out(
            jax.nn.silu(self.text_pool_embedder(pooled.astype(text_states.dtype)))
        )
        c = t_emb + pooled_emb
        x = self.proj_in(text_states)
        for block in self.blocks:
            x = block(x, c, mask)
        return x


class HunyuanCombinedEmbed(nnx.Module):
    """timestep + guidance + pooled-CLIP conditioning; also returns the bare
    timestep embedding for the routers (reference clean_timesteps_emb,
    modeling_hunyuan.py:621-645)."""

    def __init__(self, cfg: HunyuanModelConfig, *, dtype, param_dtype, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.freq_dim = cfg.freq_dim
        self.timestep_embedder = TimestepEmbedding(cfg.freq_dim, cfg.dim, **kw)
        self.guidance_embedder = (
            TimestepEmbedding(cfg.freq_dim, cfg.dim, **kw) if cfg.guidance_embeds else None
        )
        self.text_embedder_1 = nnx.Linear(cfg.pooled_dim, cfg.dim, **kw)
        self.text_embedder_2 = nnx.Linear(cfg.dim, cfg.dim, **kw)

    def __call__(self, timestep, pooled_text, guidance=None,
                 token_replace: bool = False):
        t_emb = self.timestep_embedder(sinusoidal_timestep_embedding(timestep, self.freq_dim))
        pooled = self.text_embedder_2(jax.nn.silu(self.text_embedder_1(pooled_text)))
        temb = t_emb + pooled
        tr_emb = None
        if token_replace:
            # first-frame conditioning at t=0, pooled text added, NO guidance
            # (reference: modeling_hunyuan.py:633-641)
            tr_emb = self.timestep_embedder(
                sinusoidal_timestep_embedding(jnp.zeros_like(timestep), self.freq_dim)
            ) + pooled
        if self.guidance_embedder is not None and guidance is not None:
            temb = temb + self.guidance_embedder(
                sinusoidal_timestep_embedding(guidance, self.freq_dim)
            )
        return temb, t_emb, tr_emb


class HunyuanModel(nnx.Module):
    def __init__(self, cfg: HunyuanModelConfig, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.cfg = cfg
        self.dtype = dtype
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.x_embedder = nnx.Conv(
            cfg.in_channels, cfg.dim, kernel_size=cfg.patch_size,
            strides=cfg.patch_size, padding="VALID", rngs=rngs, **kw,
        )
        self.context_embedder = TokenRefiner(cfg, rngs=rngs, **kw)
        self.time_text_embed = HunyuanCombinedEmbed(cfg, rngs=rngs, **kw)

        @nnx.split_rngs(splits=cfg.dual_layers)
        @nnx.vmap(in_axes=(0,), out_axes=0)
        def mk_dual(r):
            return HunyuanDualBlock(cfg, rngs=r, **kw)

        @nnx.split_rngs(splits=cfg.single_layers)
        @nnx.vmap(in_axes=(0,), out_axes=0)
        def mk_single(r):
            return HunyuanSingleBlock(cfg, rngs=r, **kw)

        self.dual_blocks = mk_dual(rngs)
        self.single_blocks = mk_single(rngs)
        self.norm_out = FP32LayerNorm(cfg.dim, cfg.eps, affine=False, rngs=rngs)
        self.norm_out_mod = AdaLNModulation(cfg.dim, 2, rngs=rngs, **kw)
        self.proj_out = nnx.Linear(
            cfg.dim, cfg.out_channels * int(np.prod(cfg.patch_size)), rngs=rngs, **kw
        )

    def __call__(self, *args, mm_precision: str = "bf16", **kwargs) -> HunyuanOutput:
        """See _forward.  ``mm_precision="int8"`` activates the dynamic W8A8
        path (ops/qmm.py) for the block projections/MLPs — opt-in serving
        mode; default bf16 is bit-identical to before."""
        from ..ops.qmm import mm_precision as _mm_scope

        with _mm_scope(mm_precision):
            return self._forward(*args, **kwargs)

    def _forward(
        self,
        latents: jax.Array,  # (B, T, H, W, C) channels-last
        timestep: jax.Array,  # (B,)
        text_states: jax.Array,  # (B, L, text_dim) llama hidden states
        text_mask: jax.Array,  # (B, L) bool
        pooled_text: jax.Array,  # (B, pooled_dim) CLIP pooled
        guidance: Optional[jax.Array] = None,  # (B,) guidance * 1000
        attn_cfg: Optional[AttentionConfig] = None,
        routing_mode: str = "off",
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
    ) -> HunyuanOutput:
        """Forward.  With ``sp_axis`` set (inside shard_map over that mesh
        axis), ``latents`` hold this rank's contiguous latent-frame chunk and
        ``attn_cfg.latent_shape`` is the GLOBAL token grid; text conditioning
        is replicated.  The output is the rank-local frame chunk.

        ``quantized_blocks``: pair of (dual, single) stacked block-state
        pytrees with ops/quant.QTensor weights for single-chip streaming of
        the full-depth 13B (see models/wan.py for the mechanism)."""
        cfg = self.cfg
        b, t_px, h_px, w_px, _ = latents.shape
        pt, ph, pw = cfg.patch_size
        sp_size = 1 if sp_axis is None else jax.lax.axis_size(sp_axis)
        grid = (sp_size * (t_px // pt), h_px // ph, w_px // pw)
        if attn_cfg is None:
            attn_cfg = AttentionConfig(latent_shape=grid, sta_tile=grid)
        elif attn_cfg.latent_shape != grid:
            raise ValueError(
                f"attention config latent_shape {attn_cfg.latent_shape} != "
                f"global token grid {grid}"
            )
        jcfg = JointConfig(video=attn_cfg, text_len=cfg.text_len)

        x = self.x_embedder(latents.astype(self.dtype)).reshape(b, -1, cfg.dim)
        temb, clean_temb, tr_emb = self.time_text_embed(
            timestep, pooled_text.astype(self.dtype), guidance,
            token_replace=cfg.image_condition_type == "token_replace",
        )
        first_frame_tokens = (h_px // ph) * (w_px // pw)
        ctx = self.context_embedder(text_states.astype(self.dtype), timestep, text_mask)
        rope = hunyuan_rope_tables(grid, cfg)
        if sp_axis is not None:
            # this rank's contiguous rows of the global RoPE tables
            from ..parallel.ulysses import slice_local

            rope = tuple(slice_local(r, dim=0, axis=sp_axis) for r in rope)

        teacher = return_losses
        if teacher and routing_mode == "off":
            raise ValueError("return_losses requires routed attention")

        # static int8 activation scales / calibration (ops/qmm.py): the
        # "dual."/"single." site prefixes split one table across both stacks
        from ..ops import qmm

        def stack_scales(prefix):
            if not act_scales:
                return None
            sub = {
                k: jnp.asarray(v, jnp.float32)
                for k, v in act_scales.items()
                if k.startswith(prefix)
            }
            return sub or None

        def run_stack(blocks_module, n_layers, x, ctx, xt, ct, reg, hid,
                      qtree=None, scales_xs=None):
            if frozen_sharded_axis is not None:
                # FSDP-style fallback: frozen block params arrive
                # layer-sharded; fetch one block per scan step with a psum
                # broadcast from its owner (parallel/fsdp.py)
                from ..parallel.fsdp import sharded_block_fetcher

                router_filter = nnx.All(nnx.Param, nnx.PathContains("router"))
                graphdef, router_bs, frozen_bs = nnx.split(
                    blocks_module, router_filter, ...
                )
                block_at = sharded_block_fetcher(
                    graphdef, router_bs, frozen_bs, n_layers, frozen_sharded_axis
                )
                state = jnp.arange(n_layers)
            else:
                graphdef, state = nnx.split(blocks_module)
                if qtree is not None:
                    state = qtree  # quantized stack overrides resident params

            def body(carry, scan_in):
                bstate, layer_scales = scan_in
                x, ctx, xt, ct, reg, hid = carry
                if frozen_sharded_axis is not None:
                    block = block_at(bstate)
                else:
                    if qtree is not None:
                        from ..ops.quant import dequantize_tree

                        bstate = dequantize_tree(bstate)
                    block = nnx.merge(graphdef, bstate)
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
                            x, ctx, scores = block(
                                x, ctx, temb, clean_temb, rope, text_mask, jcfg,
                                routing_mode, interpret, sp_axis,
                                token_replace_emb=tr_emb,
                                first_frame_tokens=first_frame_tokens,
                            )
                    else:
                        x, ctx, scores = block(
                            x, ctx, temb, clean_temb, rope, text_mask, jcfg,
                            routing_mode, interpret, sp_axis,
                            token_replace_emb=tr_emb,
                            first_frame_tokens=first_frame_tokens,
                        )
                if teacher:
                    # the frozen teacher runs under grad tracing, so it must
                    # use the differentiable full-attention path
                    xt_n, ct_n, _ = block(
                        xt, ct, temb, clean_temb, rope, text_mask, jcfg,
                        "off_ref", interpret, sp_axis,
                        token_replace_emb=tr_emb,
                        first_frame_tokens=first_frame_tokens,
                    )
                    xt = jax.lax.stop_gradient(xt_n)
                    ct = jax.lax.stop_gradient(ct_n)
                    reg = reg + jnp.mean(jnp.square(scores[:, :, 0]))
                    hid = hid + jnp.mean(
                        jnp.square(xt.astype(jnp.float32) - x.astype(jnp.float32))
                    )
                if scores is None:
                    scores = jnp.zeros((b, cfg.num_heads, attn_cfg.num_experts), jnp.float32)
                return (x, ctx, xt, ct, reg, hid), (scores, calib_sink)

            if remat_blocks:
                # per-block gradient checkpointing (see models/wan.py)
                body = jax.checkpoint(body, prevent_cse=False)
            (x, ctx, xt, ct, reg, hid), (scores, calib) = jax.lax.scan(
                body, (x, ctx, xt, ct, reg, hid), (state, scales_xs)
            )
            return x, ctx, xt, ct, reg, hid, scores, calib

        zero = jnp.zeros((), jnp.float32)
        x_t, c_t = x, ctx
        q_dual, q_single = quantized_blocks or (None, None)
        new_cache = None
        if step_cache is None:
            x, ctx, x_t, c_t, reg, hid, s1, calib1 = run_stack(
                self.dual_blocks, cfg.dual_layers, x, ctx, x_t, c_t, zero, zero,
                qtree=q_dual, scales_xs=stack_scales("dual."),
            )
            x, ctx, x_t, c_t, reg, hid, s2, calib2 = run_stack(
                self.single_blocks, cfg.single_layers, x, ctx, x_t, c_t, reg, hid,
                qtree=q_single, scales_xs=stack_scales("single."),
            )
        else:
            # step-residual caching (ops/stepcache.py): only the VIDEO hidden
            # state needs a cached delta — the text stream's final state is
            # discarded after the stacks, and the head reads x alone
            if teacher or calibrate_mm:
                raise ValueError(
                    "step caching is a serving mode: incompatible with "
                    "return_losses / calibrate_mm"
                )
            from ..ops.stepcache import StepCache, cache_decision

            ind = temb.astype(jnp.float32)
            skip, acc_skip = cache_decision(
                step_cache, ind, cache_threshold, cache_force_compute,
                cache_coefficients,
            )
            n_layers = cfg.dual_layers + cfg.single_layers
            x_in = x

            def compute_branch(cache):
                x1, c1, _, _, _, _, sc1, _ = run_stack(
                    self.dual_blocks, cfg.dual_layers, x_in, ctx, x_in, ctx,
                    zero, zero, qtree=q_dual, scales_xs=stack_scales("dual."),
                )
                x2, _, _, _, _, _, sc2, _ = run_stack(
                    self.single_blocks, cfg.single_layers, x1, c1, x1, c1,
                    zero, zero, qtree=q_single,
                    scales_xs=stack_scales("single."),
                )
                return x2, jnp.concatenate([sc1, sc2], axis=0), StepCache(
                    prev_ind=ind,
                    residual=(x2 - x_in).astype(x_in.dtype),
                    acc=jnp.zeros((), jnp.float32),
                    valid=jnp.ones((), bool),
                )

            def skip_branch(cache):
                xo = x_in + cache.residual.astype(x_in.dtype)
                scores = jnp.zeros(
                    (n_layers, b, cfg.num_heads, attn_cfg.num_experts), jnp.float32
                )
                return xo, scores, StepCache(
                    prev_ind=ind, residual=cache.residual, acc=acc_skip,
                    valid=cache.valid,
                )

            x, s_all, new_cache = jax.lax.cond(
                skip, skip_branch, compute_branch, step_cache
            )
            s1, s2 = s_all[: cfg.dual_layers], s_all[cfg.dual_layers :]
            reg = hid = zero
            calib1, calib2 = {}, {}

        def head(hx):
            sc, sh = self.norm_out_mod(temb)  # AdaLayerNormContinuous: scale first
            out = self.norm_out.modulated(hx, sc, sh)
            return self.proj_out(out)

        out = head(x)
        last_loss = None
        if teacher:
            out_t = jax.lax.stop_gradient(head(x_t))
            last_loss = jnp.mean(jnp.square(out_t.astype(jnp.float32) - out.astype(jnp.float32)))

        t, h, w = (t_px // pt, h_px // ph, w_px // pw)  # local grid under SP
        sample = out.reshape(b, t, h, w, pt, ph, pw, cfg.out_channels)
        sample = sample.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
            b, t * pt, h * ph, w * pw, cfg.out_channels
        )
        scores = jnp.concatenate([s1, s2], axis=0) if return_scores else None
        return HunyuanOutput(
            sample=sample,
            reg_loss=reg if teacher else None,
            last_layer_distill_loss=last_loss,
            hidden_layer_distill_loss=hid if teacher else None,
            routing_scores=scores,
            mm_calibration={**calib1, **calib2} if calibrate_mm else None,
            step_cache=new_cache,
        )
