"""DDPM scheduler with GFlowNet extensions, as pure jnp functions.

Rebuild of the fork's vendored scheduler
(src/rtb_utils/diffusers/schedulers/scheduling_ddpm_gfn.py): a standard DDPM
ancestral sampler whose ``step`` additionally returns the posterior mean/std
and the realized noise so exact Normal log-probs of the realized transition
can be accumulated (scheduling_ddpm_gfn.py:410-553), plus:

- ``target``-forcing noise (target - mu)/sigma (:522-525);
- uniform-noise xT option (:528-532);
- ``step_noise``: the deterministic forward-noising move used as the backward
  policy, with its effective std (:599-681);
- stride-aware previous/next timestep arithmetic including the reference's
  T-1 clamp quirks (:704-740).

Everything is traced-``t`` safe so the whole sampling loop runs as one
``lax.scan``; tables are precomputed numpy constants.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def betas_for_alpha_bar(num_steps: int, max_beta: float = 0.999) -> np.ndarray:
    """squaredcos_cap_v2 schedule (scheduling_ddpm_gfn.py:51-92)."""

    def alpha_bar(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = []
    for i in range(num_steps):
        t1, t2 = i / num_steps, (i + 1) / num_steps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


@dataclasses.dataclass
class DDPMGFNScheduler:
    num_train_timesteps: int = 1000
    beta_schedule: str = "squaredcos_cap_v2"
    prediction_type: str = "v_prediction"
    clip_sample: bool = True
    clip_sample_range: float = 3.0
    variance_type: str = "fixed_large"
    timestep_spacing: str = "leading"
    num_inference_steps: Optional[int] = None

    def __post_init__(self):
        if self.beta_schedule == "linear":
            betas = np.linspace(1e-4, 0.02, self.num_train_timesteps)
        elif self.beta_schedule == "squaredcos_cap_v2":
            betas = betas_for_alpha_bar(self.num_train_timesteps)
        else:
            raise NotImplementedError(self.beta_schedule)
        alphas = 1.0 - betas
        self.betas = jnp.asarray(betas, jnp.float32)
        self.alphas_cumprod = jnp.asarray(np.cumprod(alphas), jnp.float32)
        self.timesteps = self.set_timesteps(self.num_inference_steps or self.num_train_timesteps)

    # ------------------------------------------------------------------
    def set_timesteps(self, num_inference_steps: int) -> np.ndarray:
        self.num_inference_steps = num_inference_steps
        if self.timestep_spacing == "leading":
            step_ratio = self.num_train_timesteps // num_inference_steps
            ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
        elif self.timestep_spacing == "linspace":
            ts = np.linspace(0, self.num_train_timesteps - 1, num_inference_steps).round()[::-1].astype(np.int64)
        else:
            raise NotImplementedError(self.timestep_spacing)
        self.timesteps = ts
        return ts

    @property
    def stride(self) -> int:
        return self.num_train_timesteps // (self.num_inference_steps or self.num_train_timesteps)

    def previous_timestep(self, t):
        """(scheduling_ddpm_gfn.py:704-719): t - stride, +1 at t == T-1."""
        prev_t = t - self.stride
        return jnp.where(t == self.num_train_timesteps - 1, prev_t + 1, prev_t)

    def next_timestep(self, t):
        """(scheduling_ddpm_gfn.py:721-740): t + stride, clamped to T-1."""
        return jnp.minimum(t + self.stride, self.num_train_timesteps - 1)

    # ------------------------------------------------------------------
    def _alpha_prod(self, t):
        return jnp.where(t >= 0, self.alphas_cumprod[jnp.clip(t, 0)], 1.0)

    @staticmethod
    def _bc(val, x):
        """Broadcast per-batch scalars (B,) against sample dims (B, ...)."""
        if jnp.ndim(val) == 1:
            return val.reshape((-1,) + (1,) * (x.ndim - 1))
        return val

    def get_variance(self, t):
        """Posterior variance per variance_type (scheduling_ddpm_gfn.py:314-360).
        Returns STD for the sampling types used here."""
        prev_t = self.previous_timestep(t)
        alpha_prod_t = self._alpha_prod(t)
        alpha_prod_t_prev = self._alpha_prod(prev_t)
        current_beta_t = 1 - alpha_prod_t / alpha_prod_t_prev
        variance = (1 - alpha_prod_t_prev) / (1 - alpha_prod_t) * current_beta_t
        variance = jnp.clip(variance, 1e-20)
        if self.variance_type == "fixed_small":
            pass
        elif self.variance_type == "fixed_small_log":
            variance = jnp.exp(0.5 * jnp.log(variance))
        elif self.variance_type == "fixed_large":
            variance = current_beta_t
        else:
            raise NotImplementedError(self.variance_type)
        return variance

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
        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)
        return x0

    def step(
        self,
        model_output: jnp.ndarray,
        t,
        sample: jnp.ndarray,
        key: Optional[jax.Array] = None,
        noise: Optional[jnp.ndarray] = None,
        target: Optional[jnp.ndarray] = None,
        xT_type: str = "gaussian",
    ) -> dict:
        """One ancestral step t -> previous_timestep(t); returns
        {prev_sample, pred_original_sample, posterior_mean, posterior_std, noise}.
        """
        prev_t = self.previous_timestep(t)
        alpha_prod_t = self._bc(self._alpha_prod(t), sample)
        alpha_prod_t_prev = self._bc(self._alpha_prod(prev_t), sample)
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev
        current_alpha_t = alpha_prod_t / alpha_prod_t_prev
        current_beta_t = 1 - current_alpha_t

        x0 = self.pred_x0(model_output, t, sample)

        x0_coeff = (alpha_prod_t_prev**0.5 * current_beta_t) / beta_prod_t
        xt_coeff = current_alpha_t**0.5 * beta_prod_t_prev / beta_prod_t
        mean = x0_coeff * x0 + xt_coeff * sample

        if self.variance_type in ("fixed_small_log",):
            std = self._bc(self.get_variance(t), sample)
        else:
            std = self._bc(self.get_variance(t) ** 0.5, sample)

        if target is not None:
            variance_noise = (target - mean) / std
        elif noise is None:
            assert key is not None, "need a PRNG key to sample step noise"
            if xT_type == "uniform":
                variance_noise = jax.random.uniform(key, model_output.shape, minval=-3.0, maxval=3.0)
            else:
                variance_noise = jax.random.normal(key, model_output.shape)
        elif jnp.ndim(noise) == 0:
            variance_noise = noise * jnp.ones_like(model_output)
        else:
            variance_noise = noise

        add = self._bc(jnp.where(t > 0, 1.0, 0.0), sample)
        prev_sample = mean + add * std * variance_noise
        return {
            "prev_sample": prev_sample,
            "pred_original_sample": x0,
            "posterior_mean": mean,
            "posterior_std": std,
            "noise": variance_noise,
        }

    # ------------------------------------------------------------------
    def add_noise(self, original_samples, noise, timesteps, return_std: bool = False):
        a = self._alpha_prod(timesteps)
        shape = (-1,) + (1,) * (original_samples.ndim - 1)
        sa = (a**0.5).reshape(shape)
        sb = ((1 - a) ** 0.5).reshape(shape)
        x_mean = sa * original_samples
        noisy = x_mean + sb * noise
        if return_std:
            std = self.get_variance(timesteps)
            if self.variance_type not in ("fixed_small_log",):
                std = std**0.5
            return noisy, x_mean, std
        return noisy

    def step_noise(self, x, noise, t, scheduled_std: bool = True):
        """Deterministic forward-noising move prev(t) -> t (the backward-policy
        transition); returns (x_noised, mean, std) (scheduling_ddpm_gfn.py:599-681)."""
        t_end = t
        t_source = self.previous_timestep(t)
        a_source = self._alpha_prod(t_source)
        a_end = self._alpha_prod(t_end)
        x_scale = (a_end / a_source) ** 0.5
        std = (1 - a_end) ** 0.5 - x_scale * (1 - a_source) ** 0.5
        mean = x_scale * x
        x_noised = mean + std * noise
        if scheduled_std:
            std = self.get_variance(t_end)
            if self.variance_type not in ("fixed_small_log",):
                std = std**0.5
        return x_noised, mean, std

    def get_velocity(self, sample, noise, timesteps):
        a = self._alpha_prod(timesteps)
        shape = (-1,) + (1,) * (sample.ndim - 1)
        sa = (a**0.5).reshape(shape)
        sb = ((1 - a) ** 0.5).reshape(shape)
        return sa * noise - sb * sample


def normal_logprob(x, mean, std):
    """Sum of elementwise Normal log-probs over non-batch dims."""
    var = std**2
    lp = -0.5 * ((x - mean) ** 2 / var + jnp.log(2 * jnp.pi * var))
    return jnp.sum(lp, axis=tuple(range(1, x.ndim)))
