"""Ulysses sequence parallelism as shard_map collectives.

The reference implements the head<->sequence reshard with hand-written
all_to_all choreography + autograd wrappers over NCCL
(vorta/ulysses/utils.py:15-120).  On TPU the same reshard IS
``jax.lax.all_to_all`` with tiled=True — one primitive, differentiable,
riding ICI.  These helpers are meant to be called inside ``shard_map`` over
the "sp" mesh axis.

Layout contract (simpler than the reference's, and raster-preserving):
ranks hold contiguous latent-frame chunks in mesh order, so the gathered
sequence is exactly the global raster order — tile/coreset geometry composes
with no sequence remapping.  (The reference instead re-interleaves frames in
tile_layout — vorta/attention/tile.py:20-35 — which scrambles the STA window
pattern under SP; we fix rather than replicate that.)
"""

from __future__ import annotations

import jax


def all_to_all_heads_to_seq(x: jax.Array, axis: str = "sp") -> jax.Array:
    """(B, H, S_local, D) per rank -> (B, H/P, S_global, D).

    Scatter heads across the sp axis, gather the sequence: every rank ends up
    with the full sequence for a 1/P subset of heads.
    """
    return jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2, tiled=True)


def all_to_all_seq_to_heads(x: jax.Array, axis: str = "sp") -> jax.Array:
    """(B, H/P, S_global, D) -> (B, H, S_local, D): inverse reshard."""
    return jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1, tiled=True)


def gather_sequence(x: jax.Array, seq_axis: int, axis: str = "sp") -> jax.Array:
    """All-gather a sequence-sharded tensor along its sequence axis."""
    return jax.lax.all_gather(x, axis, axis=seq_axis, tiled=True)


def slice_local(x: jax.Array, dim: int, axis: str = "sp") -> jax.Array:
    """Take this rank's 1/P contiguous slice of a replicated tensor
    (reference shrink_dim, vorta/ulysses/utils.py:218-223)."""
    p = jax.lax.axis_size(axis)
    r = jax.lax.axis_index(axis)
    local = x.shape[dim] // p
    return jax.lax.dynamic_slice_in_dim(x, r * local, local, axis=dim)
