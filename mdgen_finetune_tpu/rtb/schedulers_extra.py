"""Additional GFN-instrumented schedulers: DDIM, SDE-VE, EDM-Euler, DDPM-DP.

Completes the reference's vendored scheduler family
(src/rtb_utils/diffusers/schedulers/: scheduling_ddim_gfn.py,
scheduling_sde_ve_gfn.py, scheduling_edm_euler_gfn.py,
scheduling_ddpm_dp.py; only ddpm_gfn drives the MDGen fine-tune path, but
the alternatives are part of the public surface). All steps return
{prev_sample, pred_original_sample, posterior_mean, posterior_std, noise} so
they are drop-in policies for PosteriorPriorDGFN.
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
        alpha_prod_t = self._bc(self._alpha_prod(t), sample)
        alpha_prod_t_prev = self._bc(self._alpha_prod(prev_t), sample)
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

        add = self._bc(jnp.where(t > 0, 1.0, 0.0), sample)
        prev_sample = mean + add * sigma * variance_noise
        return {
            "prev_sample": prev_sample,
            "pred_original_sample": x0,
            "posterior_mean": mean,
            "posterior_std": jnp.maximum(sigma, 1e-12),
            "noise": variance_noise,
        }


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Zero-terminal-SNR beta rescale (scheduling_ddpm_dp.py:96-129;
    arXiv:2305.08891 Alg. 1)."""
    alphas_bar_sqrt = np.sqrt(np.cumprod(1.0 - betas))
    a0, aT = alphas_bar_sqrt[0], alphas_bar_sqrt[-1]
    alphas_bar_sqrt = (alphas_bar_sqrt - aT) * (a0 / (a0 - aT))
    alphas_bar = alphas_bar_sqrt**2
    alphas = np.concatenate([alphas_bar[:1], alphas_bar[1:] / alphas_bar[:-1]])
    return 1.0 - alphas


@dataclasses.dataclass
class DDPMDPScheduler(DDPMGFNScheduler):
    """DDPM with a differentiable-posterior step (scheduling_ddpm_dp.py:132-587):
    the ancestral step additionally exposes {posterior_mean, posterior_std,
    noise} so x0 can be re-derived through the reparametrized sample for
    gradient-through-sampling (DPS-style) methods. Differences from the GFN
    scheduler: plain t - stride previous-timestep arithmetic (no T-1 quirk,
    :574-587), linear/scaled_linear/sigmoid beta schedules with the 1000/T
    rescaling (:204-218), optional zero-terminal-SNR rescale (:222-224),
    trailing timestep spacing (:319-324), and dynamic thresholding of the x0
    prediction (:372-403)."""

    beta_schedule: str = "linear"
    beta_start: float = 1e-4
    beta_end: float = 0.02
    prediction_type: str = "epsilon"
    variance_type: str = "fixed_small"
    clip_sample_range: float = 1.0
    thresholding: bool = False
    dynamic_thresholding_ratio: float = 0.995
    sample_max_value: float = 1.0
    rescale_betas_zero_snr: bool = False

    def __post_init__(self):
        T = self.num_train_timesteps
        if self.beta_schedule == "linear":
            scale = 1000.0 / T  # scheduling_ddpm_dp.py:205-208
            betas = np.linspace(scale * self.beta_start, scale * self.beta_end, T)
        elif self.beta_schedule == "scaled_linear":
            betas = np.linspace(self.beta_start**0.5, self.beta_end**0.5, T) ** 2
        elif self.beta_schedule == "squaredcos_cap_v2":
            from .scheduler import betas_for_alpha_bar

            betas = betas_for_alpha_bar(T)
        elif self.beta_schedule == "sigmoid":
            betas = 1 / (1 + np.exp(-np.linspace(-6, 6, T))) * (self.beta_end - self.beta_start) + self.beta_start
        else:
            raise NotImplementedError(self.beta_schedule)
        if self.rescale_betas_zero_snr:
            betas = rescale_zero_terminal_snr(betas)
        alphas = 1.0 - betas
        self.betas = jnp.asarray(betas, jnp.float32)
        self.alphas_cumprod = jnp.asarray(np.cumprod(alphas), jnp.float32)
        self.timesteps = self.set_timesteps(self.num_inference_steps or self.num_train_timesteps)

    def set_timesteps(self, num_inference_steps: int) -> np.ndarray:
        if self.timestep_spacing == "trailing":
            self.num_inference_steps = num_inference_steps
            step_ratio = self.num_train_timesteps / num_inference_steps
            ts = np.round(np.arange(self.num_train_timesteps, 0, -step_ratio)).astype(np.int64) - 1
            self.timesteps = ts
            return ts
        return super().set_timesteps(num_inference_steps)

    def previous_timestep(self, t):
        """t - T // num_inference_steps, no boundary quirk
        (scheduling_ddpm_dp.py:574-587)."""
        return t - self.stride

    def next_timestep(self, t):
        return jnp.minimum(t + self.stride, self.num_train_timesteps - 1)

    def pred_x0(self, model_output, t, sample):
        alpha_prod_t = self._bc(self._alpha_prod(t), sample)
        beta_prod_t = 1 - alpha_prod_t
        if self.prediction_type == "epsilon":
            x0 = (sample - beta_prod_t**0.5 * model_output) / alpha_prod_t**0.5
        elif self.prediction_type == "sample":
            x0 = model_output
        elif self.prediction_type == "v_prediction":
            x0 = alpha_prod_t**0.5 * sample - beta_prod_t**0.5 * model_output
        else:
            raise NotImplementedError(self.prediction_type)
        if self.thresholding:
            x0 = self._threshold_sample(x0)
        elif self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)
        return x0

    def _threshold_sample(self, sample):
        """Dynamic thresholding (scheduling_ddpm_dp.py:372-403): clamp x0 to
        [-s, s]/s where s is a per-sample percentile of |x0|, floored at 1."""
        B = sample.shape[0]
        flat = jnp.abs(sample.reshape(B, -1)).astype(jnp.float32)
        s = jnp.quantile(flat, self.dynamic_thresholding_ratio, axis=1)
        s = jnp.clip(s, 1.0, self.sample_max_value)
        s = s.reshape((B,) + (1,) * (sample.ndim - 1))
        return jnp.clip(sample, -s, s) / s


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
