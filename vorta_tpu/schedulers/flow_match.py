"""Flow-matching Euler schedule (rectified flow).

Functional port of the math used by diffusers' FlowMatchEulerDiscreteScheduler
as Wan drives it (training sigmas + Euler sampling with a shift):

  sigma(t) = t / T on a linspace grid, then time-shifted
  sigma' = shift * sigma / (1 + (shift - 1) * sigma)
  x_{i+1} = x_i + (sigma_{i+1} - sigma_i) * v_theta(x_i, t_i)

where the model predicts the flow velocity v = eps - x0 and
x_t = (1 - sigma) * x0 + sigma * eps (reference: scripts/wan/train_one_step.py:87,
and the scheduler the trainer instantiates at scripts/wan/train.py:274).

Everything is precomputed host-side as numpy; the sampler consumes plain
arrays, so the whole denoise loop can live under one jit.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def time_shift(sigmas: np.ndarray, shift: float) -> np.ndarray:
    return shift * sigmas / (1.0 + (shift - 1.0) * sigmas)


@dataclasses.dataclass(frozen=True)
class FlowMatchEulerSchedule:
    """Precomputed sigma/timestep tables for one sampling run."""

    sigmas: np.ndarray  # (N + 1,), last entry 0
    timesteps: np.ndarray  # (N,), in train-timestep units (0..T)
    num_train_timesteps: int = 1000

    @classmethod
    def create(
        cls,
        num_inference_steps: int,
        shift: float = 5.0,
        num_train_timesteps: int = 1000,
    ) -> "FlowMatchEulerSchedule":
        t = np.linspace(num_train_timesteps, 1.0, num_inference_steps, dtype=np.float64)
        sigmas = time_shift(t / num_train_timesteps, shift)
        timesteps = sigmas * num_train_timesteps
        sigmas = np.append(sigmas, 0.0)
        return cls(
            sigmas=sigmas.astype(np.float32),
            timesteps=timesteps.astype(np.float32),
            num_train_timesteps=num_train_timesteps,
        )

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)

    def step(self, x, velocity, i: int):
        """One Euler step: works on jax or numpy arrays."""
        dt = self.sigmas[i + 1] - self.sigmas[i]
        return x + dt * velocity


def train_sigmas(shift: float = 5.0, num_train_timesteps: int = 1000) -> np.ndarray:
    """The training-time sigma table indexed by integer timestep order
    (descending timesteps T..1, matching the scheduler the trainer reads
    sigmas from via get_sigmas — reference: vorta/train/edm_utils.py:55-64)."""
    t = np.linspace(num_train_timesteps, 1.0, num_train_timesteps, dtype=np.float64)
    return time_shift(t / num_train_timesteps, shift).astype(np.float32)
