"""Fused norm kernel vs plain-XLA reference (values + gradients).

The Pallas path is exercised in interpret mode; the public entry point
(fused_norm) falls back to the same reference math off-TPU, so these tests
pin (a) kernel == reference, (b) custom_vjp backward == autodiff of the
reference, (c) the module-level wiring (FP32LayerNorm.modulated, RMSNorm).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vorta_tpu.ops.fused_norm import (
    _norm_fwd_pallas,
    _norm_ref,
    fused_norm,
)


@pytest.mark.parametrize("rms", [False, True])
@pytest.mark.parametrize("mod", [False, True])
@pytest.mark.parametrize("affine", [False, True])
def test_kernel_matches_reference(rms, mod, affine):
    rng = np.random.default_rng(0)
    b, s, dim = 2, 48, 256
    x = jnp.asarray(rng.standard_normal((b, s, dim)) * 3, jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal((b, dim)), jnp.float32) if mod else None
    shift = jnp.asarray(rng.standard_normal((b, dim)), jnp.float32) if mod else None
    gamma = jnp.asarray(rng.standard_normal((dim,)) + 1, jnp.float32) if affine else None
    beta = jnp.asarray(rng.standard_normal((dim,)), jnp.float32) if affine and not rms else None

    out_k = _norm_fwd_pallas(x, scale, shift, gamma, beta, rms=rms, eps=1e-6,
                             out_f32=False, interpret=True)
    out_r = _norm_ref(x, scale, shift, gamma, beta, rms=rms, eps=1e-6, out_f32=False)
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32), np.asarray(out_r, np.float32),
        rtol=2e-2, atol=2e-2,
    )


@pytest.mark.parametrize("rms", [False, True])
@pytest.mark.parametrize("mod", [False, True])
def test_backward_matches_autodiff(rms, mod):
    rng = np.random.default_rng(1)
    b, s, dim = 1, 24, 128
    x = jnp.asarray(rng.standard_normal((b, s, dim)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((b, dim)), jnp.float32) if mod else None
    shift = jnp.asarray(rng.standard_normal((b, dim)), jnp.float32) if mod else None
    gamma = jnp.asarray(rng.standard_normal((dim,)) + 1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, s, dim)), jnp.float32)

    def via_fused(x, scale, shift, gamma):
        out = fused_norm(x, scale, shift, gamma, None, rms, 1e-6, False)
        return jnp.sum(out * g)

    def via_ref(x, scale, shift, gamma):
        out = _norm_ref(x, scale, shift, gamma, None, rms=rms, eps=1e-6, out_f32=False)
        return jnp.sum(out * g)

    if mod:
        gf = jax.grad(via_fused, argnums=(0, 1, 2, 3))(x, scale, shift, gamma)
        gr = jax.grad(via_ref, argnums=(0, 1, 2, 3))(x, scale, shift, gamma)
    else:
        gf = jax.grad(via_fused, argnums=(0, 3))(x, scale, shift, gamma)
        gr = jax.grad(via_ref, argnums=(0, 3))(x, scale, shift, gamma)
    for a, bb in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-4)


def test_module_wiring():
    from flax import nnx

    from vorta_tpu.models.common import FP32LayerNorm, RMSNorm

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 128)), jnp.bfloat16)
    ln = FP32LayerNorm(128, 1e-6, affine=True, rngs=nnx.Rngs(0))
    sc = jnp.asarray(rng.standard_normal((2, 128)), jnp.float32)
    sh = jnp.asarray(rng.standard_normal((2, 128)), jnp.float32)
    want = (ln.fp32(x) * (1 + sc[:, None]) + sh[:, None]).astype(x.dtype)
    got = ln.modulated(x, sc, sh)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )

    rn = RMSNorm(128, 1e-6, rngs=nnx.Rngs(0))
    xf = np.asarray(x, np.float32)
    want_r = xf / np.sqrt((xf**2).mean(-1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(
        np.asarray(rn(x), np.float32), want_r, rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("gate", [False, True])
@pytest.mark.parametrize("mod", [False, True])
def test_residual_norm_matches_unfused(gate, mod):
    from vorta_tpu.ops.fused_norm import _res_norm_ref, fused_residual_norm

    rng = np.random.default_rng(4)
    b, s, dim = 2, 24, 128
    x = jnp.asarray(rng.standard_normal((b, s, dim)), jnp.bfloat16)
    delta = jnp.asarray(rng.standard_normal((b, s, dim)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((b, dim)), jnp.float32) if gate else None
    sc = jnp.asarray(rng.standard_normal((b, dim)), jnp.float32) if mod else None
    sh = jnp.asarray(rng.standard_normal((b, dim)), jnp.float32) if mod else None
    xn, y = fused_residual_norm(x, delta, g, sc, sh, None, None, 1e-6)
    xn_r, y_r = _res_norm_ref(x, delta, g, sc, sh, None, None, 1e-6)
    np.testing.assert_allclose(np.asarray(xn, np.float32), np.asarray(xn_r, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(y_r, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_residual_norm_backward():
    from vorta_tpu.ops.fused_norm import _res_norm_ref, fused_residual_norm

    rng = np.random.default_rng(5)
    b, s, dim = 1, 16, 128
    x = jnp.asarray(rng.standard_normal((b, s, dim)), jnp.float32)
    delta = jnp.asarray(rng.standard_normal((b, s, dim)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, dim)), jnp.float32)
    sc = jnp.asarray(rng.standard_normal((b, dim)), jnp.float32)
    sh = jnp.asarray(rng.standard_normal((b, dim)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((b, s, dim)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((b, s, dim)), jnp.float32)

    def via_fused(x, delta, g, sc, sh):
        xn, y = fused_residual_norm(x, delta, g, sc, sh, None, None, 1e-6)
        return jnp.sum(xn * w1) + jnp.sum(y * w2)

    def via_ref(x, delta, g, sc, sh):
        xn, y = _res_norm_ref(x, delta, g, sc, sh, None, None, 1e-6)
        return jnp.sum(xn * w1) + jnp.sum(y * w2)

    gf = jax.grad(via_fused, argnums=(0, 1, 2, 3, 4))(x, delta, g, sc, sh)
    gr = jax.grad(via_ref, argnums=(0, 1, 2, 3, 4))(x, delta, g, sc, sh)
    for a, bb in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-4, atol=2e-4)
