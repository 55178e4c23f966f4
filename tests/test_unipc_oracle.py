"""Trajectory-level UniPC verification against an independent float64 oracle.

The oracle reimplements the published UniPC algorithm (arXiv 2302.04867) with
the exact configuration the reference uses for Wan sampling — diffusers
UniPCMultistepScheduler(use_flow_sigmas=True, solver_order=2,
solver_type="bh2", predict_x0=True, lower_order_final=True), including its
scheduler-object bookkeeping: stateful model-output history, corrector run at
the previous predictor's order, warm-up and final-step order lowering, and
the order-2 predictor shortcut rho=0.5.  diffusers itself is not installed
in this environment, so the oracle is a from-the-paper reimplementation in
float64 numpy with the diffusers state machine — structurally independent of
the scan-carry formulation in vorta_tpu/schedulers/unipc.py, which is what
it is meant to check (wrong history slots, wrong orders at boundaries, sigma
indexing).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vorta_tpu.schedulers.unipc import UniPCSchedule, unipc_sample_step


class UniPCOracle:
    """Stateful float64 UniPC (predict-x0, bh2, corrector, lower-order-final)."""

    def __init__(self, sigmas, solver_order=2):
        self.sigmas = np.asarray(sigmas, np.float64)  # (N+1,), final 0
        self.n = len(sigmas) - 1
        self.order = solver_order
        self.m_history = []  # newest last
        self.last_sample = None
        self.this_order = None
        self.lower_order_nums = 0
        self.i = 0

    @staticmethod
    def _lam(sig):
        sig = np.clip(sig, 1e-6, 1 - 1e-6)
        return np.log1p(-sig) - np.log(sig)

    def _bh_update(self, kind, m_t, x, s0_idx, t_idx, order):
        """One UniP/UniC update from point s0 to t.

        kind="p": m_t is the model output at s0 (newest history).
        kind="c": m_t is the fresh model output at t (corrector input).
        """
        sig_s0, sig_t = self.sigmas[s0_idx], self.sigmas[t_idx]
        lam_s0, lam_t = self._lam(sig_s0), self._lam(sig_t)
        alpha_t = 1.0 - sig_t
        h = lam_t - lam_s0
        hh = -h  # predict_x0
        h_phi_1 = np.expm1(hh)
        B_h = h_phi_1  # bh2

        # history divided differences relative to s0
        m0 = self.m_history[-1]
        rks, D1s = [], []
        n_hist = order - 1 if kind == "p" else order - 1
        for k in range(1, n_hist + 1):
            si = s0_idx - k
            mi = self.m_history[-(k + 1)]
            rk = (self._lam(self.sigmas[si]) - lam_s0) / h
            rks.append(rk)
            D1s.append((mi - m0) / rk)
        if kind == "c":
            rks.append(1.0)

        # b vector; R rows are rks^0, rks^1, ... (published UniPC system)
        R, b = [], []
        h_phi_k = h_phi_1 / hh - 1
        factorial_i = 1
        for k in range(1, len(rks) + 1):
            R.append(np.power(rks, k - 1))
            b.append(h_phi_k * factorial_i / B_h)
            factorial_i *= k + 1
            h_phi_k = h_phi_k / hh - 1 / factorial_i

        x_t = (sig_t / sig_s0) * x - alpha_t * h_phi_1 * m0
        if kind == "p":
            if order == 2:
                rhos = np.array([0.5])  # diffusers order-2 shortcut
            elif order > 2:
                rhos = np.linalg.solve(np.array(R), np.array(b))
            else:
                rhos = None
            if rhos is not None and D1s:
                corr = sum(r * d for r, d in zip(rhos, D1s))
                x_t = x_t - alpha_t * B_h * corr
        else:  # corrector
            D1_t = m_t - m0
            if order == 1:
                rhos = np.array([0.5])
            else:
                rhos = np.linalg.solve(np.array(R), np.array(b))
            corr = sum(r * d for r, d in zip(rhos[:-1], D1s)) if D1s else 0.0
            x_t = x_t - alpha_t * B_h * (corr + rhos[-1] * D1_t)
        return x_t

    def step(self, v, x):
        """One scheduler step with velocity prediction v at (x, sigma_i)."""
        i = self.i
        m_t = x - self.sigmas[i] * v  # flow: x0 = x - sigma * v

        if i > 0 and self.last_sample is not None:
            x = self._bh_update("c", m_t, self.last_sample, i - 1, i,
                                self.this_order)

        self.m_history.append(m_t)
        if len(self.m_history) > self.order:
            self.m_history.pop(0)

        this_order = min(self.order, self.n - i)  # lower_order_final
        self.this_order = min(this_order, self.lower_order_nums + 1)

        x_next = self._bh_update("p", m_t, x, i, i + 1, self.this_order)
        if self.lower_order_nums < self.order:
            self.lower_order_nums += 1
        self.last_sample = x
        self.i += 1
        return x_next


def synthetic_velocity(x, sigma):
    # deterministic, well-conditioned pseudo-model: identical in both paths
    return 0.3 * x + 0.7 * np.sin(3.0 * sigma) - 0.1 * x * sigma


def test_unipc_matches_oracle_trajectory():
    n_steps = 10
    sched = UniPCSchedule.create(n_steps, shift=5.0)
    sigmas64 = np.append(
        np.asarray(sched.sigmas[:-1], np.float64), 0.0
    )
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((4, 6)).astype(np.float64)

    # oracle trajectory (float64)
    oracle = UniPCOracle(sigmas64)
    x = x0.copy()
    oracle_traj = []
    for i in range(n_steps):
        v = synthetic_velocity(x, sigmas64[i])
        x = oracle.step(v, x)
        oracle_traj.append(x.copy())

    # jax scan-carry trajectory (float32 path, same math)
    sig_j = jnp.asarray(sched.sigmas)
    xj = jnp.asarray(x0, jnp.float32)
    m_prev = jnp.zeros_like(xj)
    m_prev2 = jnp.zeros_like(xj)
    x_prev = xj
    jax_traj = []
    for i in range(n_steps):
        v = jnp.asarray(
            synthetic_velocity(np.asarray(xj, np.float64), sigmas64[i]),
            jnp.float32,
        )
        xj, m_i, x_hist = unipc_sample_step(
            xj, v, jnp.asarray(i), sig_j, m_prev, x_prev, n_steps,
            m_prev2=m_prev2,
        )
        m_prev2 = m_prev
        m_prev = m_i
        x_prev = x_hist
        jax_traj.append(np.asarray(xj, np.float64))

    for i, (a, b) in enumerate(zip(jax_traj, oracle_traj)):
        np.testing.assert_allclose(
            a, b, rtol=5e-4, atol=5e-4,
            err_msg=f"trajectory diverges at step {i}",
        )


def test_unipc_order1_and_final_step_lowering():
    """2-step run: both steps must be order 1 (warmup + lower_order_final)."""
    n_steps = 2
    sched = UniPCSchedule.create(n_steps, shift=5.0)
    sigmas64 = np.append(np.asarray(sched.sigmas[:-1], np.float64), 0.0)
    x0 = np.ones((2, 2), np.float64)

    oracle = UniPCOracle(sigmas64)
    x = x0.copy()
    for i in range(n_steps):
        x = oracle.step(synthetic_velocity(x, sigmas64[i]), x)

    sig_j = jnp.asarray(sched.sigmas)
    xj = jnp.asarray(x0, jnp.float32)
    m_prev = jnp.zeros_like(xj)
    m_prev2 = jnp.zeros_like(xj)
    x_prev = xj
    for i in range(n_steps):
        v = jnp.asarray(
            synthetic_velocity(np.asarray(xj, np.float64), sigmas64[i]),
            jnp.float32,
        )
        xj, m_i, x_hist = unipc_sample_step(
            xj, v, jnp.asarray(i), sig_j, m_prev, x_prev, n_steps,
            m_prev2=m_prev2,
        )
        m_prev2, m_prev, x_prev = m_prev, m_i, x_hist
    np.testing.assert_allclose(np.asarray(xj, np.float64), x, rtol=5e-4, atol=5e-4)


def test_corrector_rhos_solve_published_system():
    """The jax corrector coefficients must equal np.linalg.solve of the
    published UniPC system R = [[1, 1], [r1, 1]] (rows rks^0, rks^1)."""
    for h, r1 in [(0.7, -1.1), (0.3, -0.8), (1.2, -1.4)]:
        hh = -h
        phi1 = np.expm1(hh)
        b1 = (phi1 / hh - 1.0) / phi1
        b2 = ((phi1 / hh - 1.0) / hh - 0.5) * 2.0 / phi1
        expected = np.linalg.solve(np.array([[1.0, 1.0], [r1, 1.0]]),
                                   np.array([b1, b2]))
        rho1 = (b1 - b2) / (1.0 - r1)
        rho2 = b1 - rho1
        np.testing.assert_allclose([rho1, rho2], expected, rtol=1e-12)
