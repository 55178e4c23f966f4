"""Wan 2.1 causal 3D VAE — native NNX implementation (channels-last).

Structure follows the Wan VAE the reference drives through diffusers
(AutoencoderKLWan; SURVEY §2.8 lists VAE decode as pipeline territory):
causal 3D convolutions (temporal padding only on the past), RMS-normalized
residual blocks, spatial attention in the mid-block, x8 spatial and x4
temporal compression with the causal first-frame asymmetry
(T_pixels = 4 * (T_latent - 1) + 1).

Temporal upsampling doubles every frame via a 2C time-conv then drops the
first duplicate, reproducing the 2T-1 causal pattern per stage.  Decoding
runs whole-clip (no streaming frame cache); VMEM/HBM at 480p81f fits a v5e.
Weight-import mapping for real checkpoints lives in io/torch_import (TODO:
verify against a real checkpoint once importable in this environment).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    base_dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    latents_mean: Tuple[float, ...] = (
        -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
        0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
    )
    latents_std: Tuple[float, ...] = (
        2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
        3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
    )


WAN_VAE = WanVAEConfig()
WAN_VAE_TINY = WanVAEConfig(base_dim=8, dim_mult=(1, 2, 2, 2), num_res_blocks=1)


class CausalConv3d(nnx.Module):
    """Conv3d with symmetric spatial padding and past-only temporal padding."""

    def __init__(self, in_ch, out_ch, kernel: Tuple[int, int, int] = (3, 3, 3),
                 stride: Tuple[int, int, int] = (1, 1, 1), *,
                 dtype, param_dtype, rngs: nnx.Rngs):
        self.kernel = kernel
        self.stride = stride
        self.conv = nnx.Conv(
            in_ch, out_ch, kernel_size=kernel, strides=stride, padding="VALID",
            dtype=dtype, param_dtype=param_dtype, rngs=rngs,
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        kt, kh, kw = self.kernel
        pads = (
            (0, 0),
            (kt - 1, 0),  # causal: pad only the past
            ((kh - 1) // 2, kh // 2),
            ((kw - 1) // 2, kw // 2),
            (0, 0),
        )
        return self.conv(jnp.pad(x, pads))


class ChannelRMSNorm(nnx.Module):
    """RMS norm over the channel axis (Wan VAE RMS_norm)."""

    def __init__(self, dim: int, *, rngs: nnx.Rngs):
        self.gamma = nnx.Param(jnp.ones((dim,), jnp.float32))
        self.dim = dim

    def __call__(self, x: jax.Array) -> jax.Array:
        xf = x.astype(jnp.float32)
        rms = jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + 1e-12)
        # Wan normalizes by channel count^0.5-scaled L2; mean-square form with
        # unit gamma matches F.normalize * sqrt(dim) * gamma
        return (xf * rms * self.gamma[None, None, None, None, :]).astype(x.dtype)


class ResidualBlock(nnx.Module):
    def __init__(self, in_ch, out_ch, *, dtype, param_dtype, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm1 = ChannelRMSNorm(in_ch, rngs=rngs)
        self.conv1 = CausalConv3d(in_ch, out_ch, **kw)
        self.norm2 = ChannelRMSNorm(out_ch, rngs=rngs)
        self.conv2 = CausalConv3d(out_ch, out_ch, **kw)
        self.shortcut = (
            CausalConv3d(in_ch, out_ch, (1, 1, 1), **kw) if in_ch != out_ch else None
        )

    def __call__(self, x):
        h = self.conv1(jax.nn.silu(self.norm1(x)))
        h = self.conv2(jax.nn.silu(self.norm2(h)))
        sc = self.shortcut(x) if self.shortcut is not None else x
        return sc + h


class SpatialAttention(nnx.Module):
    """Single-head self-attention over each frame's spatial grid."""

    def __init__(self, dim, *, dtype, param_dtype, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.norm = ChannelRMSNorm(dim, rngs=rngs)
        self.to_qkv = nnx.Linear(dim, dim * 3, **kw)
        self.proj = nnx.Linear(dim, dim, **kw)
        self.dim = dim

    def __call__(self, x):
        b, t, hh, ww, c = x.shape
        ident = x
        h = self.norm(x).reshape(b * t, hh * ww, c)
        qkv = self.to_qkv(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scores = jnp.einsum("bqc,bkc->bqk", q.astype(jnp.float32), k.astype(jnp.float32))
        probs = jax.nn.softmax(scores * (c**-0.5), axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", probs, v.astype(jnp.float32)).astype(x.dtype)
        out = self.proj(out).reshape(b, t, hh, ww, c)
        return ident + out


class SpatialDownsample(nnx.Module):
    def __init__(self, dim, *, dtype, param_dtype, rngs: nnx.Rngs):
        self.conv = nnx.Conv(dim, dim, kernel_size=(1, 3, 3), strides=(1, 2, 2),
                             padding="VALID", dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        return self.conv(x)


class TemporalDownsample(nnx.Module):
    def __init__(self, dim, *, dtype, param_dtype, rngs: nnx.Rngs):
        self.conv = CausalConv3d(dim, dim, (3, 1, 1), stride=(2, 1, 1),
                                 dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x):
        return self.conv(x)


class SpatialUpsample(nnx.Module):
    def __init__(self, dim, out_dim, *, dtype, param_dtype, rngs: nnx.Rngs):
        self.conv = nnx.Conv(dim, out_dim, kernel_size=(1, 3, 3), padding="SAME",
                             dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x):
        b, t, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        return self.conv(x)


class TemporalUpsample(nnx.Module):
    """Double frames causally: 2C time-conv -> interleave -> drop first dup."""

    def __init__(self, dim, *, dtype, param_dtype, rngs: nnx.Rngs):
        self.conv = CausalConv3d(dim, dim * 2, (3, 1, 1),
                                 dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x):
        b, t, h, w, c = x.shape
        y = self.conv(x)  # (B, T, H, W, 2C)
        y = y.reshape(b, t, h, w, 2, c)
        y = y.transpose(0, 1, 4, 2, 3, 5).reshape(b, 2 * t, h, w, c)
        return y[:, 1:]  # causal first-frame asymmetry: 2T - 1 frames


class WanVAEDecoder(nnx.Module):
    def __init__(self, cfg: WanVAEConfig, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        dims = [cfg.base_dim * m for m in cfg.dim_mult]  # e.g. [96,192,384,384]
        self.cfg = cfg
        top = dims[-1]
        self.conv_in = CausalConv3d(cfg.z_dim, top, **kw)
        self.mid_block1 = ResidualBlock(top, top, **kw)
        self.mid_attn = SpatialAttention(top, **kw)
        self.mid_block2 = ResidualBlock(top, top, **kw)

        stages = []
        in_dim = top
        rev_dims = list(reversed(dims))  # [384, 384, 192, 96]
        rev_tdown = list(reversed(cfg.temporal_downsample))  # matches stages
        for i, out_dim in enumerate(rev_dims):
            blocks = nnx.List([
                ResidualBlock(in_dim if j == 0 else out_dim, out_dim, **kw)
                for j in range(cfg.num_res_blocks + 1)
            ])
            t_up = rev_tdown[i] if i < len(rev_tdown) else False
            last = i == len(rev_dims) - 1
            stage = nnx.Dict(
                blocks=blocks,
                t_up=TemporalUpsample(out_dim, **kw) if t_up else None,
                s_up=SpatialUpsample(out_dim, out_dim, **kw) if not last else None,
            )
            stages.append(stage)
            in_dim = out_dim
        self.stages = nnx.List(stages)
        self.norm_out = ChannelRMSNorm(dims[0], rngs=rngs)
        self.conv_out = CausalConv3d(dims[0], 3, **kw)

    def __call__(self, z: jax.Array) -> jax.Array:
        """(B, T_lat, H_lat, W_lat, z_dim) -> (B, 4(T-1)+1, 8H, 8W, 3)."""
        x = self.conv_in(z)
        x = self.mid_block2(self.mid_attn(self.mid_block1(x)))
        for stage in self.stages:
            for block in stage["blocks"]:
                x = block(x)
            if stage["t_up"] is not None:
                x = stage["t_up"](x)
            if stage["s_up"] is not None:
                x = stage["s_up"](x)
        return self.conv_out(jax.nn.silu(self.norm_out(x)))


class WanVAEEncoder(nnx.Module):
    def __init__(self, cfg: WanVAEConfig, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        dims = [cfg.base_dim * m for m in cfg.dim_mult]
        self.conv_in = CausalConv3d(3, dims[0], **kw)
        stages = []
        in_dim = dims[0]
        for i, out_dim in enumerate(dims):
            blocks = nnx.List([
                ResidualBlock(in_dim if j == 0 else out_dim, out_dim, **kw)
                for j in range(cfg.num_res_blocks)
            ])
            last = i == len(dims) - 1
            stage = nnx.Dict(
                blocks=blocks,
                s_down=SpatialDownsample(out_dim, **kw) if not last else None,
                t_down=(
                    TemporalDownsample(out_dim, **kw)
                    if (not last and cfg.temporal_downsample[i])
                    else None
                ),
            )
            stages.append(stage)
            in_dim = out_dim
        self.stages = nnx.List(stages)
        top = dims[-1]
        self.mid_block1 = ResidualBlock(top, top, **kw)
        self.mid_attn = SpatialAttention(top, **kw)
        self.mid_block2 = ResidualBlock(top, top, **kw)
        self.norm_out = ChannelRMSNorm(top, rngs=rngs)
        self.conv_out = CausalConv3d(top, cfg.z_dim * 2, **kw)

    def __call__(self, video: jax.Array):
        """(B, T, H, W, 3) -> (mean, logvar) each (B, T_lat, H/8, W/8, z)."""
        x = self.conv_in(video)
        for stage in self.stages:
            for block in stage["blocks"]:
                x = block(x)
            if stage["s_down"] is not None:
                x = stage["s_down"](x)
            if stage["t_down"] is not None:
                x = stage["t_down"](x)
        x = self.mid_block2(self.mid_attn(self.mid_block1(x)))
        out = self.conv_out(jax.nn.silu(self.norm_out(x)))
        return jnp.split(out, 2, axis=-1)


class WanVAE(nnx.Module):
    def __init__(self, cfg: WanVAEConfig = WAN_VAE, *, dtype=jnp.float32,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.cfg = cfg
        self.encoder = WanVAEEncoder(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.decoder = WanVAEDecoder(cfg, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def denormalize_latents(self, z: jax.Array) -> jax.Array:
        """Invert the pipeline's latent normalization
        (reference: pipeline_wan.py:368-378)."""
        mean = jnp.asarray(self.cfg.latents_mean)
        std = jnp.asarray(self.cfg.latents_std)
        return z * std + mean

    def decode(self, z: jax.Array, denormalize: bool = True) -> jax.Array:
        if denormalize:
            z = self.denormalize_latents(z)
        return self.decoder(z)

    def encode(self, video: jax.Array):
        return self.encoder(video)
