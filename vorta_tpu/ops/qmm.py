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
(~1.4%).

STATIC activation scales close that gap: with a per-(site, layer) scalar
scale known at trace time there is no amax reduction, so XLA fuses the
round/clip quantize into the producing op's epilogue — zero extra
activation passes.  The flow:

1. each QLinear carries a ``site`` label (e.g. "attn1.to_q"), shared by the
   same projection across all scanned layers;
2. calibration: run forwards under ``calibration_scope()`` — every QLinear
   records max|x| per site; the model's block scan returns them stacked per
   layer (``calibrate_mm=True``), and ``tools/calibrate_int8.py`` reduces
   max over calibration batches into a ``{site: (num_layers,)}`` table;
3. serving: the model threads the table through its block scan and sets the
   per-layer scalar slice via ``layer_act_scales()`` around each block call;
   QLinear uses the static scale when its site is present, falling back to
   dynamic per-token scales otherwise.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

_MM_PRECISION: contextvars.ContextVar[str] = contextvars.ContextVar(
    "vorta_mm_precision", default="bf16"
)
# {site: scalar f32} — per-layer static activation scales, set at trace time
# inside the model's block scan (layer_act_scales)
_ACT_SCALES: contextvars.ContextVar = contextvars.ContextVar(
    "vorta_act_scales", default=None
)
# {site: scalar f32 amax} — calibration sink; QLinear records max|x| here
_CALIB: contextvars.ContextVar = contextvars.ContextVar(
    "vorta_mm_calib", default=None
)


@contextlib.contextmanager
def layer_act_scales(scales):
    """Provide this layer's static activation scales ({site: scalar}) to the
    QLinear calls traced under the context.  Used inside block scans: the
    body is traced once, so the traced per-layer slice reaches every site."""
    tok = _ACT_SCALES.set(scales)
    try:
        yield
    finally:
        _ACT_SCALES.reset(tok)


@contextlib.contextmanager
def calibration_scope():
    """Collect per-site activation amax from QLinear calls traced under the
    context.  Yields the sink dict {site: traced scalar f32}; same-site calls
    within one scope max-reduce together."""
    sink: dict = {}
    tok = _CALIB.set(sink)
    try:
        yield sink
    finally:
        _CALIB.reset(tok)


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


def int8_linear(x: jax.Array, kernel: jax.Array, bias=None, x_scale=None) -> jax.Array:
    """y = x @ kernel (+ bias) with symmetric int8 quantization.

    x: (..., K); kernel: (K, N).  Activation scales are per-token (row) when
    dynamic, or the given STATIC per-tensor scalar ``x_scale`` (from
    calibration — no amax pass, quantize fuses into the producer); weight
    scales per-out-channel; accumulation in int32 on the MXU, rescale in
    f32, output in x.dtype.
    """
    out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    if x_scale is None:
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

    ``site`` names this projection within its block (shared across scanned
    layers) for the static-scale table; unnamed QLinears always use dynamic
    per-token scales.
    """

    def __init__(self, *args, site: str | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.site = site

    def __call__(self, x: jax.Array) -> jax.Array:  # type: ignore[override]
        calib = _CALIB.get()
        if calib is not None and self.site is not None:
            amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
            prev = calib.get(self.site)
            calib[self.site] = amax if prev is None else jnp.maximum(prev, amax)
        if _MM_PRECISION.get() == "int8":
            bias = self.bias.value if self.bias is not None else None
            scales = _ACT_SCALES.get()
            x_scale = (
                scales.get(self.site) if scales is not None and self.site else None
            )
            return int8_linear(x, self.kernel.value, bias, x_scale=x_scale)
        return super().__call__(x)


def fused_linear(x: jax.Array, linears) -> list:
    """Apply several (Q)Linears that share the same input as ONE matmul.

    Concatenates the kernels (and biases) along the output dim, runs a single
    dot, and splits the result — numerically identical to calling each layer
    (each output column's accumulation chain is unchanged), but one kernel
    launch instead of len(linears), and under the int8 context the activation
    is quantized ONCE instead of per projection (the dynamic amax pass over a
    72k-token stream costs more than the int8 MXU win recovers — see module
    docstring).

    Calibration/static scales: all layers see the same input, so one shared
    amax is recorded for every named site, and at serving the max of the
    sites' static scales quantizes the concatenated matmul.
    """
    sizes = [l.kernel.value.shape[1] for l in linears]
    wcat = jnp.concatenate([l.kernel.value for l in linears], axis=1)
    if any(l.bias is not None for l in linears):
        bcat = jnp.concatenate([
            l.bias.value if l.bias is not None
            else jnp.zeros((n,), x.dtype)
            for l, n in zip(linears, sizes)
        ])
    else:
        bcat = None

    sites = [getattr(l, "site", None) for l in linears]
    calib = _CALIB.get()
    if calib is not None and any(s is not None for s in sites):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        for s in sites:
            if s is not None:
                prev = calib.get(s)
                calib[s] = amax if prev is None else jnp.maximum(prev, amax)

    if _MM_PRECISION.get() == "int8":
        scales = _ACT_SCALES.get()
        x_scale = None
        if scales is not None:
            have = [scales[s] for s in sites if s is not None and s in scales]
            if have:
                x_scale = jnp.max(jnp.stack(have))
        out = int8_linear(x, wcat, bcat, x_scale=x_scale)
    else:
        out = x @ wcat.astype(x.dtype)
        if bcat is not None:
            out = out + bcat.astype(out.dtype)
    bounds = np.cumsum([0] + sizes)
    return [out[..., bounds[i]:bounds[i + 1]] for i in range(len(sizes))]
