"""Euler discrete scheduler with EDM preconditioning (SVD semantics).

The denoise loop the reference delegates to the external
DepthCrafterPipeline (reference: model/depthcrafter.py:79-90, 5 inference
steps, guidance 1.0) is driven by diffusers' EulerDiscreteScheduler with the
scheduler config shipped inside SVD checkpoints:

  beta_schedule   scaled_linear, beta in [0.00085, 0.012], 1000 train steps
  use_karras_sigmas = true, sigma_min = 0.002, sigma_max = 700.0
  timestep_type   = "continuous"  →  c_noise = 0.25 · ln(sigma)
  timestep_spacing = "leading", steps_offset = 1
  prediction_type = v_prediction

which reduces to:

  sigmas        Karras ramp (rho = 7) between config sigma_max and
                sigma_min, ``num_inference_steps`` values descending,
                terminated by sigma = 0;
  timesteps     0.25 · ln(sigma)  (the EDM c_noise the UNet was trained on)
  scale input   x_in = x / sqrt(sigma² + 1)
  v-prediction  denoised = v · (-sigma / sqrt(sigma²+1)) + x / (sigma²+1)
  Euler step    x ← x + (x - denoised)/sigma · (sigma_next - sigma)
  init noise    x_T = noise · sqrt(sigma_max² + 1)   ("leading" spacing)

Everything is precomputed into static arrays so the whole denoise loop runs
as a single ``lax.fori_loop`` inside one jitted program.

The beta-derived sigma table (sigma_t = sqrt((1-ᾱ_t)/ᾱ_t)) is kept for
(a) ``use_karras_sigmas=False`` operation matching plain SD-style configs
and (b) the training-side sigma sampling.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EulerDiscreteConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    timestep_spacing: str = "leading"  # linspace | leading | trailing
    steps_offset: int = 1
    # SVD checkpoint scheduler_config.json values:
    use_karras_sigmas: bool = True
    sigma_min: Optional[float] = 0.002
    sigma_max: Optional[float] = 700.0
    timestep_type: str = "continuous"  # "discrete" | "continuous"
    karras_rho: float = 7.0

    @classmethod
    def from_json(cls, path_or_dict) -> "EulerDiscreteConfig":
        """Build from a diffusers ``scheduler_config.json`` (as shipped inside
        SVD/DepthCrafter checkpoint directories) or an already-parsed dict.
        Unknown keys are ignored; missing keys keep the SVD defaults."""
        if isinstance(path_or_dict, dict):
            raw = path_or_dict
        else:
            import json

            with open(path_or_dict) as f:
                raw = json.load(f)
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in fields})


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

    # ------------------------------------------------------------------

    def _spaced_timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Descending (fractional) train-timestep grid per timestep_spacing."""
        n_train = self.config.num_train_timesteps
        spacing = self.config.timestep_spacing
        if spacing == "linspace":
            return np.linspace(0, n_train - 1, num_inference_steps, dtype=np.float64)[::-1]
        if spacing == "leading":
            step = n_train // num_inference_steps
            ts = (np.arange(num_inference_steps) * step).round()[::-1].astype(np.float64)
            return ts + self.config.steps_offset
        if spacing == "trailing":
            step = n_train / num_inference_steps
            return np.arange(n_train, 0, -step).round().astype(np.float64) - 1
        raise ValueError(f"unknown timestep_spacing {spacing!r}")

    def _karras_sigmas(self, in_sigmas: np.ndarray, n: int) -> np.ndarray:
        """Karras et al. (2022) noise schedule: rho-warped ramp between the
        schedule extremes (diffusers _convert_to_karras; config sigma_min/max
        override the in-schedule extremes when set)."""
        cfg = self.config
        sigma_min = cfg.sigma_min if cfg.sigma_min is not None else float(in_sigmas[-1])
        sigma_max = cfg.sigma_max if cfg.sigma_max is not None else float(in_sigmas[0])
        rho = cfg.karras_rho
        ramp = np.linspace(0, 1, n, dtype=np.float64)
        min_inv_rho = sigma_min ** (1 / rho)
        max_inv_rho = sigma_max ** (1 / rho)
        return (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho

    def inference_sigmas(self, num_inference_steps: int) -> np.ndarray:
        """[num_steps+1] descending sigmas, last = 0."""
        timesteps = self._spaced_timesteps(num_inference_steps)
        sigmas = np.interp(
            timesteps, np.arange(self.config.num_train_timesteps), self.train_sigmas
        )
        if self.config.use_karras_sigmas:
            sigmas = self._karras_sigmas(sigmas, num_inference_steps)
        return np.concatenate([sigmas, [0.0]]).astype(np.float32)

    def timesteps_for_sigmas(self, sigmas: np.ndarray) -> np.ndarray:
        """The UNet conditioning value for each sigma.

        timestep_type "continuous" (SVD): c_noise = 0.25·ln(sigma).
        "discrete": invert the train-sigma table (fractional timestep).
        """
        if self.config.timestep_type == "continuous":
            return (0.25 * np.log(np.asarray(sigmas, np.float64))).astype(np.float32)
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
