"""Tiled VAE decoding — the 720p x 129f decode memory cliff.

The reference enables diffusers' VAE tiling for Hunyuan 720p inference
(`vae.enable_tiling()` — /root/reference/scripts/hunyuan/inference.py:100):
the latent grid is decoded in overlapping spatial (and optionally temporal)
tiles whose outputs are linearly blended across the overlap, bounding peak
activation memory by the tile size instead of the full clip.

This wrapper is VAE-agnostic (works for WanVAE and HunyuanVAE: both are
causal x8 spatial / x4 temporal with the first-frame asymmetry).  Tiles are
decoded by a single jitted decode per tile shape (interior tiles share one
compiled program); blending matches the diffusers scheme (linear ramps over
the overlap region, later tiles composited over earlier ones).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SPATIAL = 8  # pixel / latent
TEMPORAL = 4  # frames / latent frame (causal: 4(T-1)+1)


def _starts(total: int, tile: int, overlap: int):
    """Tile start offsets with `overlap` latent rows shared between tiles."""
    if total <= tile:
        return [0]
    stride = tile - overlap
    starts = list(range(0, total - tile, stride))
    starts.append(total - tile)
    return starts


def _ramp(n: int):
    return (np.arange(n, dtype=np.float32) + 1.0) / (n + 1.0)


def tiled_decode(
    decode_fn: Callable[[jax.Array], jax.Array],
    z: jax.Array,  # (B, T_lat, H_lat, W_lat, C) — already denormalized
    tile_latent: Tuple[int, int, int] = (16, 32, 32),
    overlap_latent: Tuple[int, int, int] = (4, 8, 8),
) -> jax.Array:
    """Decode ``z`` in overlapping tiles, blending linearly at the seams.

    decode_fn maps a latent tile (B, t, h, w, C) -> pixels
    (B, 4(t-1)+1, 8h, 8w, 3).  Temporal tiles after the first drop their
    first output frame when compositing (it corresponds to the overlap's
    causal warm-up), mirroring diffusers' temporal tiling.
    """
    b, t, h, w, _ = z.shape
    tt = min(tile_latent[0], t)
    th = min(tile_latent[1], h)
    tw = min(tile_latent[2], w)
    t_starts = _starts(t, tt, overlap_latent[0])
    h_starts = _starts(h, th, overlap_latent[1])
    w_starts = _starts(w, tw, overlap_latent[2])
    if len(t_starts) == 1 and len(h_starts) == 1 and len(w_starts) == 1:
        return decode_fn(z)

    out_t = TEMPORAL * (t - 1) + 1
    out = np.zeros((b, out_t, SPATIAL * h, SPATIAL * w, 3), np.float32)
    weight = np.zeros((1, out_t, SPATIAL * h, SPATIAL * w, 1), np.float32)
    decode_jit = jax.jit(decode_fn)

    for t0 in t_starts:
        for h0 in h_starts:
            for w0 in w_starts:
                tile = z[:, t0:t0 + tt, h0:h0 + th, w0:w0 + tw]
                px = np.asarray(decode_jit(tile), np.float32)
                # pixel-space placement
                pt0 = TEMPORAL * t0  # frame offset (causal first-frame rule)
                ph0, pw0 = SPATIAL * h0, SPATIAL * w0
                ptn, phn, pwn = px.shape[1], px.shape[2], px.shape[3]
                wgt = np.ones((1, ptn, phn, pwn, 1), np.float32)
                # linear ramps on BOTH sides of each overlap (leading edge of
                # the later tile, trailing edge of the earlier tile) so the
                # normalized blend crossfades 100%->0% with no discontinuity
                # at tile boundaries, like diffusers' blend_h/blend_v
                if t0 > 0:
                    n = TEMPORAL * overlap_latent[0]
                    wgt[:, :n] *= _ramp(n)[None, :, None, None, None]
                if t0 != t_starts[-1]:
                    n = TEMPORAL * overlap_latent[0]
                    wgt[:, ptn - n:] *= _ramp(n)[::-1][None, :, None, None, None]
                if h0 > 0:
                    n = SPATIAL * overlap_latent[1]
                    wgt[:, :, :n] *= _ramp(n)[None, None, :, None, None]
                if h0 != h_starts[-1]:
                    n = SPATIAL * overlap_latent[1]
                    wgt[:, :, phn - n:] *= _ramp(n)[::-1][None, None, :, None, None]
                if w0 > 0:
                    n = SPATIAL * overlap_latent[2]
                    wgt[:, :, :, :n] *= _ramp(n)[None, None, None, :, None]
                if w0 != w_starts[-1]:
                    n = SPATIAL * overlap_latent[2]
                    wgt[:, :, :, pwn - n:] *= _ramp(n)[::-1][None, None, None, :, None]
                out[:, pt0:pt0 + ptn, ph0:ph0 + phn, pw0:pw0 + pwn] += px * wgt
                weight[:, pt0:pt0 + ptn, ph0:ph0 + phn, pw0:pw0 + pwn] += wgt

    return jnp.asarray(out / np.maximum(weight, 1e-8))
