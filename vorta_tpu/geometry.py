"""Static attention geometry, precomputed host-side with numpy.

Everything in this module is a pure function of the (static) latent video
shape and attention config — no device arrays, no tracing.  The results are
baked into the jitted computation as constants, which is what makes the
sparse-attention experts XLA/Pallas friendly: the sliding-tile visibility
pattern and the coreset group structure are known at trace time.

Reference behaviours re-implemented here (TPU-first, not a translation):
  * pixel->latent-token shape math      (reference: vorta/patch/utils.py:59-95)
  * coreset group/center/margin indices (reference: vorta/attention/coreset_select.py:15-60)
  * tile <-> raster layout permutations (reference: vorta/attention/tile.py)
  * sliding-tile visibility mask        (reference: vorta/attention/sliding_attn_flex.py:72-134)
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

Shape3 = Tuple[int, int, int]


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# Pixel -> latent-token shape math
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TokenGeometry:
    """Maps pixel-space video shapes to DiT token-grid shapes.

    A video of ``(frames, height, width)`` pixels passes through a causal 3D
    VAE (temporal x4, spatial x8 for both Wan and Hunyuan) and then the DiT
    patchifier (temporal x1, spatial x2), so one token covers
    ``temporal_vae*temporal_patch`` frames and ``spatial_vae*spatial_patch``
    pixels per side.  Causal VAEs emit one extra leading latent frame, hence
    the ``mod == 1`` rule (e.g. 77 frames -> 20 latent frames).
    """

    temporal_vae: int = 4
    spatial_vae: int = 8
    temporal_patch: int = 1
    spatial_patch: int = 2

    @property
    def temporal_total(self) -> int:
        return self.temporal_vae * self.temporal_patch

    @property
    def spatial_total(self) -> int:
        return self.spatial_vae * self.spatial_patch

    @staticmethod
    def _to_tokens(num_pixels: int, stride: int) -> int:
        n, mod = divmod(num_pixels, stride)
        if mod == 0:
            return n
        if mod == 1:  # causal VAE: first frame stands alone
            return n + 1
        raise ValueError(
            f"pixel extent {num_pixels} is not a multiple (or multiple+1) of stride {stride}"
        )

    def tokens(self, video_shape: Shape3) -> Shape3:
        f, h, w = video_shape
        return (
            self._to_tokens(f, self.temporal_total),
            self._to_tokens(h, self.spatial_total),
            self._to_tokens(w, self.spatial_total),
        )

    def latent_frames(self, num_pixel_frames: int) -> int:
        return self._to_tokens(num_pixel_frames, self.temporal_vae)


WAN_GEOMETRY = TokenGeometry(temporal_vae=4, spatial_vae=8)
HUNYUAN_GEOMETRY = TokenGeometry(temporal_vae=4, spatial_vae=8)


# ---------------------------------------------------------------------------
# Coreset (low-res expert) group structure
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _LowresGeometry:
    latent_shape: Shape3
    window: Shape3
    center_slot: int


@dataclasses.dataclass(frozen=True)
class LowresGroups:
    """Partition of the 3D token grid into non-overlapping windows.

    ``center`` is the raster index of each window's center token; ``margins``
    are the remaining window tokens in raster order.  The low-res expert keeps
    every center plus the ``num_kept_margins`` margin tokens *least similar*
    to their center, and drops the rest (their output is filled with the
    center's output at unpool time).
    """

    center: np.ndarray  # (G,) int32 raster indices
    margins: np.ndarray  # (G, M) int32 raster indices
    num_kept_margins: int  # tokens kept per group besides the center

    @property
    def num_groups(self) -> int:
        return int(self.center.shape[0])

    @property
    def group_size(self) -> int:
        return int(self.margins.shape[1]) + 1

    @property
    def num_dropped(self) -> int:
        return int(self.margins.shape[1]) - self.num_kept_margins

    @property
    def pooled_length(self) -> int:
        return self.num_groups * (1 + self.num_kept_margins)

    @property
    def full_length(self) -> int:
        return self.num_groups * self.group_size


def build_lowres_groups(
    latent_shape: Shape3,
    window: Shape3,
    reduction_rate: float = 0.5,
) -> LowresGroups:
    """Window the raster-ordered token grid and locate each window's center.

    Matches the reference semantics (coreset_select.py:15-60): windows are
    non-overlapping, iterated in raster order over window indices, and tokens
    within a window keep their raster order.  The number of kept tokens per
    group is ``int(group_size * (1 - reduction_rate)) - 1`` margins + 1 center.
    """
    t, h, w = latent_shape
    wt, wh, ww = window
    if t % wt or h % wh or w % ww:
        raise ValueError(f"window {window} must divide latent shape {latent_shape}")

    gt, gh, gw = t // wt, h // wh, w // ww
    idx = np.arange(t * h * w, dtype=np.int32).reshape(t, h, w)
    # (gt, wt, gh, wh, gw, ww) -> (gt, gh, gw, wt, wh, ww): group-major, then
    # raster order inside the window.
    blocks = idx.reshape(gt, wt, gh, wh, gw, ww).transpose(0, 2, 4, 1, 3, 5)
    groups = blocks.reshape(gt * gh * gw, wt * wh * ww)

    center_slot = (wt // 2) * wh * ww + (wh // 2) * ww + (ww // 2)
    center = groups[:, center_slot].copy()
    margins = np.delete(groups, center_slot, axis=1)

    group_size = wt * wh * ww
    num_kept = int(group_size * (1.0 - reduction_rate)) - 1
    if not (0 <= num_kept <= margins.shape[1]):
        raise ValueError(
            f"reduction_rate {reduction_rate} with window {window} keeps {num_kept} margins"
        )
    out = LowresGroups(center=center, margins=margins, num_kept_margins=num_kept)
    # stash the generating geometry: the jnp coreset ops re-derive the group
    # structure as a static window relayout instead of index gathers
    object.__setattr__(
        out,
        "_geom",
        _LowresGeometry(
            latent_shape=(t, h, w), window=(wt, wh, ww), center_slot=int(center_slot)
        ),
    )
    return out


# ---------------------------------------------------------------------------
# Tile <-> raster layout
# ---------------------------------------------------------------------------


def tile_permutation(latent_shape: Shape3, tile: Shape3) -> np.ndarray:
    """Permutation taking a raster-ordered sequence to tile-contiguous order.

    ``out[i] = seq[perm[i]]`` puts each (tile_t, tile_h, tile_w) tile's tokens
    contiguously, tiles ordered raster over tile indices, tokens inside a tile
    ordered raster.  This is the layout the sliding-tile expert attends in, so
    its visibility mask is block-structured.
    """
    t, h, w = latent_shape
    tt, th, tw = tile
    if t % tt or h % th or w % tw:
        raise ValueError(f"tile {tile} must divide latent shape {latent_shape}")
    nt, nh, nw = t // tt, h // th, w // tw
    idx = np.arange(t * h * w, dtype=np.int32).reshape(t, h, w)
    tiled = idx.reshape(nt, tt, nh, th, nw, tw).transpose(0, 2, 4, 1, 3, 5)
    return tiled.reshape(-1)


def inverse_permutation(perm: np.ndarray) -> np.ndarray:
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0], dtype=perm.dtype)
    return inv


# ---------------------------------------------------------------------------
# Sliding-tile attention (STA) visibility
# ---------------------------------------------------------------------------


def sta_tile_mask(latent_shape: Shape3, window: Shape3, tile: Shape3) -> np.ndarray:
    """Tile-granular visibility matrix for sliding-tile attention.

    ``mask[q_tile, kv_tile]`` is True when the kv tile lies inside the window
    centered on the q tile, with the window center clamped so it never hangs
    off the grid border (reference: sliding_attn_flex.py:118-127).  ``window``
    is measured in tiles and must be odd per axis to be symmetric; clamping
    means border queries see the same in-grid window as the nearest interior
    tile, so every query attends to exactly ``prod(window)`` tiles.
    """
    t, h, w = latent_shape
    tt, th, tw = tile
    if t % tt or h % th or w % tw:
        raise ValueError(f"tile {tile} must divide latent shape {latent_shape}")
    nt, nh, nw = t // tt, h // th, w // tw
    wt, wh, ww = window

    def axis_mask(n: int, win: int) -> np.ndarray:
        q = np.arange(n)
        kv = np.arange(n)
        half = win // 2
        lo, hi = half, (n - 1) - half
        if lo > hi:  # window covers the whole axis
            center = np.full_like(q, n // 2)
            return np.abs(center[:, None] - kv[None, :]) <= max(half, n)
        center = np.clip(q, lo, hi)
        return np.abs(center[:, None] - kv[None, :]) <= half

    mt = axis_mask(nt, wt)
    mh = axis_mask(nh, wh)
    mw = axis_mask(nw, ww)
    # combine: visibility factorizes over axes
    mask = (
        mt[:, None, None, :, None, None]
        & mh[None, :, None, None, :, None]
        & mw[None, None, :, None, None, :]
    )
    n_tiles = nt * nh * nw
    return mask.reshape(n_tiles, n_tiles)


def expand_tile_mask(
    tile_mask: np.ndarray, tokens_per_tile: int, block_q: int, block_kv: int
) -> np.ndarray:
    """Expand a tile-granular mask to kernel-block granularity.

    Valid (exact) whenever the kernel block sizes divide ``tokens_per_tile``;
    each tile then spans a whole number of kernel blocks and visibility is
    constant within a block.
    """
    if tokens_per_tile % block_q or tokens_per_tile % block_kv:
        raise ValueError(
            f"block sizes ({block_q},{block_kv}) must divide tokens_per_tile={tokens_per_tile}"
        )
    rq = tokens_per_tile // block_q
    rkv = tokens_per_tile // block_kv
    return np.kron(tile_mask, np.ones((rq, rkv), dtype=bool))


def block_mask_to_tables(block_mask: np.ndarray, pad_to: int | None = None):
    """Turn a (n_q_blocks, n_kv_blocks) boolean mask into kernel block tables.

    Returns ``(kv_index, kv_count)`` where ``kv_index[q, j]`` is the j-th
    active kv block for q-block ``q`` (ascending), padded by repeating the
    last active block (so the Pallas pipeline elides the DMA for padded
    steps), and ``kv_count[q]`` is the number of active blocks.  Rows with no
    active block get index 0 and count 0.
    """
    n_q, n_kv = block_mask.shape
    counts = block_mask.sum(axis=1).astype(np.int32)
    width = int(pad_to if pad_to is not None else max(int(counts.max(initial=0)), 1))
    kv_index = np.zeros((n_q, width), dtype=np.int32)
    for q in range(n_q):
        active = np.nonzero(block_mask[q])[0]
        if active.size == 0:
            continue
        if active.size > width:
            raise ValueError(f"row {q} has {active.size} active blocks > pad_to={width}")
        kv_index[q, : active.size] = active
        kv_index[q, active.size :] = active[-1]
    return kv_index, counts


def full_block_tables(n_q_blocks: int, n_kv_blocks: int):
    """Block tables for dense (full) attention: every kv block active."""
    kv_index = np.broadcast_to(
        np.arange(n_kv_blocks, dtype=np.int32)[None, :], (n_q_blocks, n_kv_blocks)
    ).copy()
    counts = np.full((n_q_blocks,), n_kv_blocks, dtype=np.int32)
    return kv_index, counts
