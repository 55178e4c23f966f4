"""Raster <-> tile-contiguous sequence layout transforms.

The sliding-tile expert attends over a sequence reordered so that each 3D
tile's tokens are contiguous (reference: vorta/attention/tile.py).  On TPU we
express the reorder as reshape+transpose (XLA lowers it to a relayout copy,
no gather needed).  Unlike the reference there is no sequence-parallel remap
here: our Ulysses all-to-all preserves global raster order by construction
(contiguous rank shards reassembled rank-major), so tiling composes directly.
"""

from __future__ import annotations

from typing import Tuple

import jax

Shape3 = Tuple[int, int, int]


def tile_sequence(x: jax.Array, latent_shape: Shape3, tile: Shape3) -> jax.Array:
    """(..., S, D) raster order -> tile-contiguous order.

    S must equal prod(latent_shape); tokens inside a tile stay raster-ordered,
    tiles are raster-ordered over tile indices.
    """
    t, h, w = latent_shape
    tt, th, tw = tile
    nt, nh, nw = t // tt, h // th, w // tw
    lead = x.shape[:-2]
    d = x.shape[-1]
    x = x.reshape(*lead, nt, tt, nh, th, nw, tw, d)
    n = len(lead)
    perm = tuple(range(n)) + tuple(i + n for i in (0, 2, 4, 1, 3, 5, 6))
    return x.transpose(perm).reshape(*lead, t * h * w, d)


def untile_sequence(x: jax.Array, latent_shape: Shape3, tile: Shape3) -> jax.Array:
    """Inverse of :func:`tile_sequence`."""
    t, h, w = latent_shape
    tt, th, tw = tile
    nt, nh, nw = t // tt, h // th, w // tw
    lead = x.shape[:-2]
    d = x.shape[-1]
    x = x.reshape(*lead, nt, nh, nw, tt, th, tw, d)
    n = len(lead)
    perm = tuple(range(n)) + tuple(i + n for i in (0, 3, 1, 4, 2, 5, 6))
    return x.transpose(perm).reshape(*lead, t * h * w, d)
