"""HunyuanVideo causal 3D VAE — native NNX implementation (channels-last).

Decode-first implementation of the VAE the reference drives through
diffusers' AutoencoderKLHunyuanVideo (`self.vae.decode(latents / ... +
scaling_factor)` — /root/reference/vorta/patch/pipeline_hunyuan.py:460-463;
`vae.enable_tiling()` — /root/reference/scripts/hunyuan/inference.py:100):

  * causal 3D convolutions (temporal padding on the past only)
  * GroupNorm(32) + SiLU residual blocks
  * x8 spatial / x4 temporal compression with the causal first-frame
    asymmetry (T_pixels = 4 * (T_latent - 1) + 1)
  * latents scaled by a single scaling_factor (0.476986) rather than Wan's
    per-channel mean/std
  * mid-block spatial self-attention per frame

Tiled decoding for the 720p x 129f memory cliff lives in
models/vae_tiling.py (reference: vae.enable_tiling()).

NOTE on fidelity: built to the diffusers architecture as documented;
internals (upsampler frame split, attention scope) should be re-verified
against real checkpoints when importable in this environment — same caveat
as models/wan_vae.py.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from .wan_vae import CausalConv3d


@dataclasses.dataclass(frozen=True)
class HunyuanVAEConfig:
    base_dims: Tuple[int, ...] = (128, 256, 512, 512)
    z_dim: int = 16
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.476986
    temporal_upsample: Tuple[bool, ...] = (True, True, False)  # per up stage


HUNYUAN_VAE = HunyuanVAEConfig()
HUNYUAN_VAE_TINY = HunyuanVAEConfig(
    base_dims=(8, 16, 16, 16), layers_per_block=1, norm_groups=4
)


class GNResBlock(nnx.Module):
    """GroupNorm + SiLU residual block with causal 3D convs."""

    def __init__(self, in_ch, out_ch, groups, *, dtype, param_dtype, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm1 = nnx.GroupNorm(in_ch, num_groups=min(groups, in_ch), rngs=rngs)
        self.conv1 = CausalConv3d(in_ch, out_ch, **kw)
        self.norm2 = nnx.GroupNorm(out_ch, num_groups=min(groups, out_ch), rngs=rngs)
        self.conv2 = CausalConv3d(out_ch, out_ch, **kw)
        self.shortcut = (
            CausalConv3d(in_ch, out_ch, (1, 1, 1), **kw) if in_ch != out_ch else None
        )

    def __call__(self, x):
        h = self.conv1(jax.nn.silu(self.norm1(x)))
        h = self.conv2(jax.nn.silu(self.norm2(h)))
        sc = self.shortcut(x) if self.shortcut is not None else x
        return sc + h


class GNSpatialAttention(nnx.Module):
    """Single-head per-frame spatial self-attention (mid-block)."""

    def __init__(self, dim, groups, *, dtype, param_dtype, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm = nnx.GroupNorm(dim, num_groups=min(groups, dim), rngs=rngs)
        self.to_qkv = nnx.Linear(dim, dim * 3, **kw)
        self.proj = nnx.Linear(dim, dim, **kw)

    def __call__(self, x):
        b, t, hh, ww, c = x.shape
        ident = x
        h = self.norm(x).reshape(b * t, hh * ww, c)
        q, k, v = jnp.split(self.to_qkv(h), 3, axis=-1)
        scores = jnp.einsum(
            "bqc,bkc->bqk", q.astype(jnp.float32), k.astype(jnp.float32)
        )
        probs = jax.nn.softmax(scores * (c**-0.5), axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", probs, v.astype(jnp.float32)).astype(x.dtype)
        return ident + self.proj(out).reshape(b, t, hh, ww, c)


class CausalUpsample(nnx.Module):
    """Nearest-neighbour x2 upsample (spatial always, temporal optional with
    the causal first-frame split: the first frame is not duplicated in time,
    giving 2T-1 output frames), followed by a causal conv."""

    def __init__(self, dim, out_dim, temporal: bool, *, dtype, param_dtype,
                 rngs: nnx.Rngs):
        self.temporal = temporal
        self.conv = CausalConv3d(dim, out_dim, dtype=dtype,
                                 param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        if self.temporal:
            x = jnp.repeat(x, 2, axis=1)[:, 1:]  # causal: 2T - 1 frames
        return self.conv(x)


class CausalDownsample(nnx.Module):
    """Strided causal conv: spatial /2 always, temporal /2 optional."""

    def __init__(self, dim, out_dim, temporal: bool, *, dtype, param_dtype,
                 rngs: nnx.Rngs):
        stride = (2 if temporal else 1, 2, 2)
        self.temporal = temporal
        self.conv = CausalConv3d(dim, out_dim, stride=stride, dtype=dtype,
                                 param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x):
        return self.conv(x)


class HunyuanVAEDecoder(nnx.Module):
    def __init__(self, cfg: HunyuanVAEConfig, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        g = cfg.norm_groups
        dims = list(reversed(cfg.base_dims))  # e.g. [512, 512, 256, 128]
        top = dims[0]
        self.conv_in = CausalConv3d(cfg.z_dim, top, **kw)
        self.mid_block1 = GNResBlock(top, top, g, **kw)
        self.mid_attn = GNSpatialAttention(top, g, **kw)
        self.mid_block2 = GNResBlock(top, top, g, **kw)

        stages = []
        in_dim = top
        for i, out_dim in enumerate(dims):
            blocks = nnx.List([
                GNResBlock(in_dim if j == 0 else out_dim, out_dim, g, **kw)
                for j in range(cfg.layers_per_block + 1)
            ])
            last = i == len(dims) - 1
            t_up = cfg.temporal_upsample[i] if i < len(cfg.temporal_upsample) else False
            stage = nnx.Dict(
                blocks=blocks,
                up=CausalUpsample(out_dim, out_dim, t_up, **kw) if not last else None,
            )
            stages.append(stage)
            in_dim = out_dim
        self.stages = nnx.List(stages)
        self.norm_out = nnx.GroupNorm(dims[-1], num_groups=min(g, dims[-1]), rngs=rngs)
        self.conv_out = CausalConv3d(dims[-1], 3, **kw)

    def __call__(self, z: jax.Array) -> jax.Array:
        """(B, T_lat, H_lat, W_lat, z) -> (B, 4(T-1)+1, 8H, 8W, 3)."""
        x = self.conv_in(z)
        x = self.mid_block2(self.mid_attn(self.mid_block1(x)))
        for stage in self.stages:
            for block in stage["blocks"]:
                x = block(x)
            if stage["up"] is not None:
                x = stage["up"](x)
        return self.conv_out(jax.nn.silu(self.norm_out(x)))


class HunyuanVAEEncoder(nnx.Module):
    def __init__(self, cfg: HunyuanVAEConfig, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        g = cfg.norm_groups
        dims = list(cfg.base_dims)
        self.conv_in = CausalConv3d(3, dims[0], **kw)
        stages = []
        in_dim = dims[0]
        # encoder temporal downsampling mirrors the decoder's upsample stages
        t_down = list(reversed(cfg.temporal_upsample))
        for i, out_dim in enumerate(dims):
            blocks = nnx.List([
                GNResBlock(in_dim if j == 0 else out_dim, out_dim, g, **kw)
                for j in range(cfg.layers_per_block)
            ])
            last = i == len(dims) - 1
            stage = nnx.Dict(
                blocks=blocks,
                down=(
                    CausalDownsample(
                        out_dim, out_dim,
                        t_down[i] if i < len(t_down) else False, **kw
                    )
                    if not last else None
                ),
            )
            stages.append(stage)
            in_dim = out_dim
        self.stages = nnx.List(stages)
        top = dims[-1]
        self.mid_block1 = GNResBlock(top, top, g, **kw)
        self.mid_attn = GNSpatialAttention(top, g, **kw)
        self.mid_block2 = GNResBlock(top, top, g, **kw)
        self.norm_out = nnx.GroupNorm(top, num_groups=min(g, top), rngs=rngs)
        self.conv_out = CausalConv3d(top, cfg.z_dim * 2, **kw)

    def __call__(self, video: jax.Array):
        """(B, T, H, W, 3) -> (mean, logvar), each (B, T_lat, H/8, W/8, z)."""
        x = self.conv_in(video)
        for stage in self.stages:
            for block in stage["blocks"]:
                x = block(x)
            if stage["down"] is not None:
                x = stage["down"](x)
        x = self.mid_block2(self.mid_attn(self.mid_block1(x)))
        out = self.conv_out(jax.nn.silu(self.norm_out(x)))
        return jnp.split(out, 2, axis=-1)


class HunyuanVAE(nnx.Module):
    def __init__(self, cfg: HunyuanVAEConfig = HUNYUAN_VAE, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.cfg = cfg
        self.encoder = HunyuanVAEEncoder(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.decoder = HunyuanVAEDecoder(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def denormalize_latents(self, z: jax.Array) -> jax.Array:
        """Invert the pipeline's scaling (reference: pipeline_hunyuan.py:460-463
        divides by vae.config.scaling_factor before decode)."""
        return z / self.cfg.scaling_factor

    def decode(self, z: jax.Array, denormalize: bool = True) -> jax.Array:
        if denormalize:
            z = self.denormalize_latents(z)
        return self.decoder(z)

    def encode(self, video: jax.Array):
        return self.encoder(video)
