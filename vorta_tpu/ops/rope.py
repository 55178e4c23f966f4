"""3D rotary position embeddings for video DiTs.

The reference applies RoPE as a complex multiply in float64
(vorta/attention/wan.py:34-37) with frequencies from diffusers'
WanRotaryPosEmbed.  TPUs have no float64, so we precompute the rotation
angles host-side in numpy float64 (they are a pure function of the static
latent grid) and take cos/sin before casting to float32 — the only on-device
work is the f32 pairwise rotation, whose error (~1e-7) is far below bf16
activation noise.

Head-dim split across axes matches the reference (modeling_wan.py:249-256):
t gets ``d/2 - 2*(d/6)`` complex frequencies, h and w get ``d/6`` each
(for d=128: 22/21/21).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Shape3 = Tuple[int, int, int]


def _axis_angles(num_pos: int, num_freqs: int, theta: float) -> np.ndarray:
    """angle[p, k] = p * theta**(-k / num_freqs), float64."""
    k = np.arange(num_freqs, dtype=np.float64)
    inv_freq = theta ** (-k / num_freqs)
    pos = np.arange(num_pos, dtype=np.float64)
    return np.outer(pos, inv_freq)


def rope_axis_split(head_dim: int) -> Tuple[int, int, int]:
    """Number of complex frequency slots per (t, h, w) axis."""
    d6 = head_dim // 6
    return head_dim // 2 - 2 * d6, d6, d6


def video_rope_angles(
    latent_shape: Shape3,
    head_dim: int,
    theta: float = 10000.0,
) -> np.ndarray:
    """Per-token rotation angles, shape (S, head_dim // 2), float64.

    Token order is raster over the latent grid.  Frame/row/col angle tables
    are broadcast across the other two axes and concatenated along the
    frequency axis in (t, h, w) order.
    """
    t, h, w = latent_shape
    ct, ch, cw = rope_axis_split(head_dim)
    at = _axis_angles(t, ct, theta)  # (t, ct)
    ah = _axis_angles(h, ch, theta)
    aw = _axis_angles(w, cw, theta)
    full = np.concatenate(
        [
            np.broadcast_to(at[:, None, None, :], (t, h, w, ct)),
            np.broadcast_to(ah[None, :, None, :], (t, h, w, ch)),
            np.broadcast_to(aw[None, None, :, :], (t, h, w, cw)),
        ],
        axis=-1,
    )
    return full.reshape(t * h * w, head_dim // 2)


def rope_cos_sin(
    latent_shape: Shape3,
    head_dim: int,
    theta: float = 10000.0,
    dtype=np.float32,
) -> Tuple[np.ndarray, np.ndarray]:
    angles = video_rope_angles(latent_shape, head_dim, theta)
    return np.cos(angles).astype(dtype), np.sin(angles).astype(dtype)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate interleaved pairs of the last dim of (..., S, D).

    Matches complex multiplication on pairs (x[2k], x[2k+1]):
      out[2k]   = x[2k] * cos_k - x[2k+1] * sin_k
      out[2k+1] = x[2k] * sin_k + x[2k+1] * cos_k
    ``cos``/``sin`` have shape (S, D//2) and broadcast over leading dims.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    even = xf[..., 0::2]
    odd = xf[..., 1::2]
    out_even = even * cos - odd * sin
    out_odd = even * sin + odd * cos
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)
    return out.astype(orig_dtype)


def half_perm(head_dim: int) -> np.ndarray:
    """Permutation from the interleaved-pair layout to the contiguous-half
    layout: ``x_half = x_interleaved[..., half_perm(d)]`` puts pair members
    (2k, 2k+1) at positions (k, k + d//2)."""
    return np.concatenate(
        [np.arange(0, head_dim, 2), np.arange(1, head_dim, 2)]
    )


def permute_qk_to_half(arr: np.ndarray, head_dim: int, axis: int = -1) -> np.ndarray:
    """Permute per-head blocks of size ``head_dim`` along ``axis`` from the
    interleaved-pair to the contiguous-half RoPE layout.

    Used at weight import: permuting a q/k projection's output channels (and
    the matching qk-norm gains) this way makes ``apply_rope_half`` compute
    bit-identical attention to interleaved RoPE on unpermuted weights — the
    q·k dot is invariant to any shared channel permutation, and channels
    that never receive RoPE (text tokens in joint attention) are simply
    relabeled consistently on both q and k.
    """
    n = arr.shape[axis]
    assert n % head_dim == 0, (n, head_dim)
    p = half_perm(head_dim)
    idx = (np.arange(n // head_dim)[:, None] * head_dim + p[None, :]).reshape(-1)
    return np.take(arr, idx, axis=axis)


def apply_rope_half(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate contiguous halves of the last dim of (..., S, D).

    Equivalent to ``apply_rope`` after permuting the last dim with
    ``half_perm(D)`` (pair (2k, 2k+1) lives at (k, k + D//2)):
      out[k]        = x[k] * cos_k - x[k + D/2] * sin_k
      out[k + D/2]  = x[k] * sin_k + x[k + D/2] * cos_k
    Contiguous 64-lane halves replace stride-2 lane shuffles, which is much
    cheaper on the TPU VPU; the models use this convention internally and
    the torch importer permutes q/k projection columns to compensate.
    """
    orig_dtype = x.dtype
    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    x1 = xf[..., : d // 2]
    x2 = xf[..., d // 2 :]
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.astype(orig_dtype)
