"""UniPC multistep scheduler (flow-matching variant).

The reference samples Wan with diffusers' UniPCMultistepScheduler under flow
sigmas (scripts/wan/inference.py:110-116, flow_shift 5.0/7.0).  This is a
functional JAX implementation of the same method (UniPC, arXiv 2302.04867;
predict-x0 variant, solver order 2, B(h) = expm1(h) i.e. "bh2", corrector
enabled, lower-order final) suitable for a lax.scan denoise loop.

Flow parameterization: alpha_t = 1 - sigma_t, model predicts the velocity
v = eps - x0, so the data prediction is x0 = x - sigma * v.

State carried between steps: previous data prediction m_{i-1}, the previous
(pre-predictor) sample, and the step index; order logic (first step order 1,
last step order 1 when lower_order_final) uses jnp.where so the whole loop
stays inside one jit.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .flow_match import time_shift


@dataclasses.dataclass(frozen=True)
class UniPCSchedule:
    sigmas: np.ndarray  # (N + 1,), final 0
    timesteps: np.ndarray  # (N,)
    num_train_timesteps: int = 1000

    @classmethod
    def create(cls, num_inference_steps: int, shift: float = 5.0,
               num_train_timesteps: int = 1000) -> "UniPCSchedule":
        # diffusers UniPC with use_flow_sigmas: sigma grid from descending
        # timesteps, shifted; identical to the flow-match Euler grid
        t = np.linspace(num_train_timesteps, 1.0, num_inference_steps, dtype=np.float64)
        sigmas = time_shift(t / num_train_timesteps, shift)
        timesteps = sigmas * num_train_timesteps
        return cls(
            sigmas=np.append(sigmas, 0.0).astype(np.float32),
            timesteps=timesteps.astype(np.float32),
            num_train_timesteps=num_train_timesteps,
        )

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)


def _lambda(sigma):
    # lambda = log(alpha) - log(sigma), alpha = 1 - sigma (flow)
    sigma = jnp.clip(sigma, 1e-6, 1.0 - 1e-6)
    return jnp.log1p(-sigma) - jnp.log(sigma)


def unipc_sample_step(
    x,  # current sample (f32)
    v,  # model velocity prediction at (x, sigma_i)
    i,  # step index (traced ok)
    sigmas,  # (N+1,) jnp
    m_prev,  # data prediction at step i-1 (valid when i > 0)
    x_prev,  # corrected sample at step i-1
    num_steps: int,
    m_prev2=None,  # data prediction at step i-2 (valid when i > 1);
    # None keeps the order-1 corrector everywhere (legacy)
):
    """One UniPC step: corrector for the current state, then predictor.

    Order bookkeeping mirrors diffusers UniPCMultistepScheduler
    (solver_order=2, solver_type=bh2, predict_x0, lower_order_final): the
    corrector at step i runs at the order the PREVIOUS predictor used
    (1 at i=1, 2 for i >= 2), the predictor runs order 2 except at the first
    and final steps.

    Returns (x_next, m_i, x_for_history).
    """
    sig_i = sigmas[i]
    sig_n = sigmas[i + 1]
    m_i = x - sig_i * v  # x0 prediction at current sample

    # Exact-flow identity (data prediction): for h = lam_t - lam_s > 0,
    #   x_t = (sig_t / sig_s) x_s - alpha_t * expm1(-h) * x0
    # multistep terms correct x0 with divided differences of the history.
    lam_i = _lambda(sig_i)
    lam_p = _lambda(sigmas[jnp.maximum(i - 1, 0)])
    sig_p = sigmas[jnp.maximum(i - 1, 0)]
    alpha_i = 1.0 - sig_i

    # --- corrector (UniC): re-derive the CURRENT sample from the previous
    # state using the fresh data prediction.  B(h) = expm1(hh) ("bh2").
    hh_c = -(lam_i - lam_p)
    phi1_c = jnp.expm1(hh_c)  # = B_h
    d1_t = m_i - m_prev
    if m_prev2 is None:
        rho2 = 0.5
        corr_terms = rho2 * d1_t
    else:
        # order-2 corrector: solve [[1, 1], [r1, 1]] rho = [b1, b2]
        # (R rows are rks^0, rks^1 — the published UniPC system) with
        # r1 = (lam_{i-2} - lam_{i-1}) / (lam_i - lam_{i-1})
        lam_pp = _lambda(sigmas[jnp.maximum(i - 2, 0)])
        h_c = lam_i - lam_p
        r1 = (lam_pp - lam_p) / _nonzero(h_c)
        b1 = (phi1_c / _nonzero(hh_c) - 1.0) / _nonzero(phi1_c)
        b2 = ((phi1_c / _nonzero(hh_c) - 1.0) / _nonzero(hh_c) - 0.5) * 2.0 / _nonzero(phi1_c)
        rho1 = (b1 - b2) / _nonzero(1.0 - r1)
        rho2_solved = b1 - rho1
        d1s = (m_prev2 - m_prev) / _nonzero(r1)
        use2 = i >= 2
        corr_terms = jnp.where(use2, rho1, 0.0) * d1s + jnp.where(
            use2, rho2_solved, 0.5
        ) * d1_t
    x_corr = (
        _safe_ratio(sig_i, sig_p) * x_prev
        - alpha_i * phi1_c * m_prev
        - alpha_i * phi1_c * corr_terms
    )
    x_c = jnp.where(i > 0, x_corr, x)

    # --- predictor (UniP) to sigma_{i+1}
    lam_n = _lambda(sig_n)
    hh = lam_n - lam_i
    alpha_n = 1.0 - sig_n
    phi1 = jnp.expm1(-hh)
    x1 = _safe_ratio(sig_n, sig_i) * x_c - alpha_n * phi1 * m_i
    # order-2: extrapolated divided difference, rho = 0.5 (diffusers'
    # order-2 shortcut, equal to DPM-Solver++(2M))
    r_prev = _nonzero((lam_i - lam_p) / _nonzero(hh))
    d1 = (m_i - m_prev) / r_prev
    x2 = x1 - alpha_n * phi1 * 0.5 * d1
    # first step and final step run order 1 (lower_order_final)
    use_order2 = (i > 0) & (i < num_steps - 1)
    x_next = jnp.where(use_order2, x2, x1)
    return x_next, m_i, x_c


def _safe_ratio(a, b):
    return a / jnp.where(b == 0, 1.0, b)


def _nonzero(x):
    return jnp.where(jnp.abs(x) < 1e-12, 1.0, x)
