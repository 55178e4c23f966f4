"""Device mesh construction for (data, sequence) parallelism.

The reference partitions the torch.distributed world into contiguous
sequence-parallel groups with the leftover factor as data parallelism
(vorta/ulysses/parallel_states.py:55-72).  Here the same structure is a 2D
``jax.sharding.Mesh`` with named axes ("dp", "sp"); the sp axis should map to
ICI neighbors (jax's default device order on a TPU slice does this) and dp
may span DCN on multi-slice deployments.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DP_AXIS = "dp"
SP_AXIS = "sp"


def make_mesh(
    sp_size: int = 1,
    dp_size: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % sp_size:
        raise ValueError(f"device count {n} not divisible by sp_size {sp_size}")
    if dp_size is None:
        dp_size = n // sp_size
    if dp_size * sp_size > n:
        raise ValueError(f"dp*sp = {dp_size * sp_size} > {n} devices")
    devices = devices[: dp_size * sp_size]
    # contiguous sp groups: adjacent devices share an sp group (ICI locality)
    arr = np.asarray(devices).reshape(dp_size, sp_size)
    return Mesh(arr, (DP_AXIS, SP_AXIS))


def pin_platform_from_env() -> None:
    """Honor an explicit JAX_PLATFORMS env var.

    Some environments side-load accelerator plugins via sitecustomize and
    force-append them to jax_platforms, which silently overrides the user's
    JAX_PLATFORMS=cpu (e.g. for a virtual multi-device CPU mesh).  CLIs call
    this before first device use to restore the requested platform."""
    import os

    import jax

    want = os.environ.get("JAX_PLATFORMS", "")
    if want and "axon" not in want:
        jax.config.update("jax_platforms", want)
