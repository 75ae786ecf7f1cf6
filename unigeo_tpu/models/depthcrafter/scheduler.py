"""Euler discrete scheduler with EDM preconditioning (SVD semantics).

The denoise loop the reference delegates to the external
DepthCrafterPipeline (reference: model/depthcrafter.py:79-90, 5 inference
steps, guidance 1.0) reduces on the scheduler side to:

  sigmas        from the trained beta schedule: sigma_t = sqrt((1-ᾱ_t)/ᾱ_t)
                (scaled-linear betas), linearly interpolated down to
                ``num_inference_steps`` values, terminated by sigma=0;
  scale input   x_in = x / sqrt(sigma² + 1)
  v-prediction  denoised = v * (-sigma / sqrt(sigma²+1)) + x / (sigma²+1)
  Euler step    x ← x + (x - denoised)/sigma · (sigma_next - sigma)
  init noise    x_T = noise · sqrt(sigma_max² + 1)

Everything is precomputed into static arrays so the whole denoise loop runs
as a single ``lax.fori_loop`` inside one jitted program.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EulerDiscreteConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    timestep_spacing: str = "leading"  # linspace | leading | trailing
    steps_offset: int = 1


class EulerDiscreteScheduler:
    def __init__(self, config: EulerDiscreteConfig = EulerDiscreteConfig()):
        self.config = config
        betas = (
            np.linspace(
                config.beta_start**0.5,
                config.beta_end**0.5,
                config.num_train_timesteps,
                dtype=np.float64,
            )
            ** 2
        )
        alphas_cumprod = np.cumprod(1.0 - betas)
        self.train_sigmas = np.sqrt((1.0 - alphas_cumprod) / alphas_cumprod)

    def inference_sigmas(self, num_inference_steps: int) -> np.ndarray:
        """[num_steps+1] descending sigmas, last = 0."""
        n_train = self.config.num_train_timesteps
        spacing = self.config.timestep_spacing
        if spacing == "linspace":
            timesteps = np.linspace(0, n_train - 1, num_inference_steps, dtype=np.float64)[::-1]
        elif spacing == "leading":
            step = n_train // num_inference_steps
            timesteps = (np.arange(num_inference_steps) * step).round()[::-1].astype(np.float64)
            timesteps += self.config.steps_offset
        elif spacing == "trailing":
            step = n_train / num_inference_steps
            timesteps = np.arange(n_train, 0, -step).round().astype(np.float64) - 1
        else:
            raise ValueError(f"unknown timestep_spacing {spacing!r}")
        sigmas = np.interp(timesteps, np.arange(n_train), self.train_sigmas)
        return np.concatenate([sigmas, [0.0]]).astype(np.float32)

    def timesteps_for_sigmas(self, sigmas: np.ndarray) -> np.ndarray:
        """Map sigma back to (fractional) train timestep for UNet conditioning."""
        return np.interp(
            sigmas, self.train_sigmas, np.arange(self.config.num_train_timesteps)
        ).astype(np.float32)

    @staticmethod
    def init_noise_scale(sigma_max: float) -> float:
        return float(np.sqrt(sigma_max**2 + 1.0))

    @staticmethod
    def scale_model_input(sample, sigma):
        return sample / jnp.sqrt(sigma**2 + 1.0)

    @staticmethod
    def denoised_from_v(sample, v_pred, sigma):
        """EDM v-prediction preconditioning: c_out·v + c_skip·x."""
        c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
        c_skip = 1.0 / (sigma**2 + 1.0)
        return v_pred * c_out + sample * c_skip

    @staticmethod
    def euler_step(sample, denoised, sigma, sigma_next):
        derivative = (sample - denoised) / sigma
        return sample + derivative * (sigma_next - sigma)

    # ------------------------------------------------------------------
    # training-side API (for the diffusion train step)
    # ------------------------------------------------------------------

    def add_noise(self, clean, noise, sigma):
        """EDM forward process: x = clean + sigma * noise."""
        return clean + sigma * noise

    def v_target(self, clean, noise, sigma):
        """The v-prediction target consistent with denoised_from_v."""
        # denoised = v*c_out + x*c_skip must equal clean:
        # v = (clean - x/(sigma²+1)) · (-sqrt(sigma²+1)/sigma)
        x = clean + sigma * noise
        c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
        c_skip = 1.0 / (sigma**2 + 1.0)
        return (clean - c_skip * x) / c_out
