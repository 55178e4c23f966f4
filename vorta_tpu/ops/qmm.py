"""Dynamic W8A8 int8 matmuls for the non-attention floor (serving mode).

At the trained-router mix the routed block is floor-bound: FFN + projections
run at the bf16 MXU peak (~35 ms of a ~110 ms Wan-1.3B 720p block), so no
bf16 kernel can improve them.  The v5e MXU runs int8 x int8 -> int32 at 2x
the bf16 rate (394 vs 197 TOPS); this module quantizes BOTH operands on the
fly inside the jit — per-token activation scales, per-out-channel weight
scales, symmetric — and lets XLA fuse the quantize/dequantize elementwise
work around one int8 `dot_general`.

This is a serving-quality trade the reference does not offer (its floor ops
run bf16/fp16 via torch.compile); it is OFF by default everywhere and
enabled per call via ``mm_precision("int8")`` around a model forward, or the
``--mm int8`` flag on the bench/CLI tools.  Router training always runs the
default bf16 path (round() has no useful gradient).

Weight re-quantization per call costs one read+write of W (e.g. 27 MB for
the 1.3B FFN — ~0.05 ms) which keeps checkpoints, importers and the
quantized-block streaming path (ops/quant.py) unchanged: QLinear's param
tree is identical to nnx.Linear's.

Measured on v5e (Wan-1.3B 720p): the raw int8 dot runs 3.1x bf16 (436 TOPS
vs 139 TF/s), but DYNAMIC quantization adds two extra passes over the
activations (amax + quantize), which on the wide K=8960 out-projection
costs nearly the whole MXU win (bf16 15.4 -> int8 14.6 ms; the K=1536
in-projection keeps 14.6 -> 10.6).  Net e2e: routed denoise 3307 -> 3262 ms
(~1.4%).  The headroom is STATIC activation scales (calibrated per tensor,
quantize fused into the producing op, no extra passes) — meaningful only
with real calibrated checkpoints, so this module keeps the dynamic scheme.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp
from flax import nnx

_MM_PRECISION: contextvars.ContextVar[str] = contextvars.ContextVar(
    "vorta_mm_precision", default="bf16"
)


@contextlib.contextmanager
def mm_precision(mode: str):
    """Trace-time switch: matmuls under this context use ``mode``
    ("bf16" | "int8").  Baked into the traced graph — no runtime branch."""
    if mode not in ("bf16", "int8"):
        raise ValueError(f"mm_precision must be bf16|int8, got {mode}")
    tok = _MM_PRECISION.set(mode)
    try:
        yield
    finally:
        _MM_PRECISION.reset(tok)


def current_mm_precision() -> str:
    return _MM_PRECISION.get()


def int8_linear(x: jax.Array, kernel: jax.Array, bias=None) -> jax.Array:
    """y = x @ kernel (+ bias) with dynamic symmetric int8 quantization.

    x: (..., K); kernel: (K, N).  Per-token (row) activation scales,
    per-out-channel weight scales; accumulation in int32 on the MXU,
    rescale in f32, output in x.dtype.
    """
    out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    x_amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    x_scale = jnp.maximum(x_amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)

    wf = kernel.astype(jnp.float32)
    w_amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)  # (1, N)
    w_scale = jnp.maximum(w_amax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(wf / w_scale), -127, 127).astype(jnp.int8)

    acc = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * x_scale * w_scale[0]
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


class QLinear(nnx.Linear):
    """nnx.Linear whose forward obeys the mm_precision() context.

    Identical parameter tree to nnx.Linear ("kernel"/"bias"), so torch
    import, orbax checkpoints and the stacked-block quantized streaming all
    work unchanged; only the traced matmul differs when the int8 context is
    active at trace time.
    """

    def __call__(self, x: jax.Array) -> jax.Array:  # type: ignore[override]
        if _MM_PRECISION.get() == "int8":
            bias = self.bias.value if self.bias is not None else None
            return int8_linear(x, self.kernel.value, bias)
        return super().__call__(x)
