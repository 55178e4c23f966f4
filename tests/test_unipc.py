import jax
import jax.numpy as jnp
import numpy as np

from vorta_tpu.schedulers.flow_match import FlowMatchEulerSchedule
from vorta_tpu.schedulers.unipc import UniPCSchedule, unipc_sample_step


def run_sampler(schedule, velocity_fn, x_init):
    sigmas = jnp.asarray(schedule.sigmas)
    n = schedule.num_steps

    def step(carry, i):
        x, m_prev, x_prev = carry
        v = velocity_fn(x, sigmas[i])
        x_next, m_i, x_hist = unipc_sample_step(x, v, i, sigmas, m_prev, x_prev, n)
        return (x_next, m_i, x_hist), ()

    m0 = jnp.zeros_like(x_init)
    (x, _, _), _ = jax.lax.scan(step, (x_init, m0, x_init), jnp.arange(n))
    return x


def test_unipc_exact_linear_flow():
    # exact rectified-flow velocity: v = eps - x0 (constant) -> lands on x0
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((4, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((4, 4)), jnp.float32)
    sched = UniPCSchedule.create(10, shift=5.0)
    v = eps - x0
    out = run_sampler(sched, lambda x, s: v, eps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-3, atol=1e-3)


def test_unipc_beats_euler_on_nonlinear_flow():
    # toy nonlinear flow: x0 depends on current state; UniPC (2nd order)
    # should track the ODE better than Euler at the same step count
    def velocity(x, sigma):
        x0_hat = jnp.tanh(x)  # pretend data prediction
        eps_hat = (x - (1 - sigma) * x0_hat) / jnp.maximum(sigma, 1e-4)
        return eps_hat - x0_hat

    # ground truth: integrate finely with Euler
    fine = FlowMatchEulerSchedule.create(4000, shift=3.0)
    x = jnp.asarray([[0.7, -1.3, 0.2, 2.0]], jnp.float32)
    xt = x
    for i in range(fine.num_steps):
        xt = xt + (fine.sigmas[i + 1] - fine.sigmas[i]) * velocity(xt, fine.sigmas[i])
    truth = np.asarray(xt)

    steps = 12
    coarse_e = FlowMatchEulerSchedule.create(steps, shift=3.0)
    xe = x
    for i in range(coarse_e.num_steps):
        xe = xe + (coarse_e.sigmas[i + 1] - coarse_e.sigmas[i]) * velocity(xe, coarse_e.sigmas[i])
    err_euler = np.abs(np.asarray(xe) - truth).max()

    sched = UniPCSchedule.create(steps, shift=3.0)
    xu = run_sampler(sched, velocity, x)
    err_unipc = np.abs(np.asarray(xu) - truth).max()
    assert err_unipc < err_euler, (err_unipc, err_euler)


def test_unipc_schedule_matches_flow_grid():
    a = UniPCSchedule.create(50, shift=5.0)
    b = FlowMatchEulerSchedule.create(50, shift=5.0)
    np.testing.assert_allclose(a.sigmas, b.sigmas, rtol=1e-6)
    np.testing.assert_allclose(a.timesteps, b.timesteps, rtol=1e-6)
