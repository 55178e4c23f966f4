"""Empirical Mosaic capability probe for the window-dense STA kernel:

1. box DMA: HBM (T, HH, W, D) -> VMEM (wt, wh, ww, D) strided box copy
2. matmul with multi-leading-dim RHS: dot_general((bq, D), (wt, wh, ww, D))
   when ww*? is sublane-tile-aligned (ww multiple of 16 at bf16)

Run on the real TPU; prints PASS/FAIL per probe.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, HH, W, D = 8, 16, 32, 128
WT, WH, WW = 4, 8, 16  # window box (ww=16 -> bf16 sublane aligned)
BQ = 128


def kernel(starts_ref, q_ref, k_hbm, out_ref, kbuf, sem):
    t0 = starts_ref[0]
    h0 = starts_ref[1]
    w0 = pl.multiple_of(starts_ref[2], 8)  # W offsets are tile_w-aligned
    cp = pltpu.make_async_copy(
        k_hbm.at[pl.ds(t0, WT), pl.ds(h0, WH), pl.ds(w0, WW), :],
        kbuf,
        sem,
    )
    cp.start()
    cp.wait()
    q = q_ref[...]  # (BQ, D)
    k = kbuf[...].reshape(WT * WH * WW, D)  # tile-aligned merge (WW % 16 == 0)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, WT*WH*WW)
    out_ref[...] = jnp.max(s, axis=1, keepdims=True)


def main():
    key = jax.random.PRNGKey(0)
    kk = jax.random.normal(key, (T, HH, W, D), jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (BQ, D), jnp.bfloat16)
    starts = jnp.array([2, 4, 16], jnp.int32)

    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((BQ, D), lambda i, *r: (0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((BQ, 1), lambda i, *r: (0, 0)),
            scratch_shapes=[
                pltpu.VMEM((WT, WH, WW, D), jnp.bfloat16),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((BQ, 1), jnp.float32),
    )
    out = np.asarray(f(starts, q, kk))

    # oracle
    box = np.asarray(kk, np.float32)[2:6, 4:12, 16:32, :]
    s = np.einsum("qd,abcd->qabc", np.asarray(q, np.float32), box)
    ref = s.reshape(BQ, -1).max(axis=1)
    ok = np.allclose(out[:, 0], ref, rtol=2e-2, atol=2e-2)
    print("box-DMA + 4D dot:", "PASS" if ok else "FAIL",
          float(np.abs(out[:, 0] - ref).max()))


if __name__ == "__main__":
    main()
