"""Interpolant coupling plans for stochastic-interpolant flow matching.

Pure-function rebuild of the SiT path classes (src/mdgen/transport/path.py).
Each path defines x_t = alpha_t * x1 + sigma_t * x0 with closed-form
derivatives; everything is elementwise jnp and trivially fuses under jit.

t broadcasting: all methods accept t of shape (B,) or already-broadcast
shapes; ``expand_t`` reshapes (B,) -> (B, 1, 1, ...) against a pytree leaf.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def expand_t(t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """(B,) -> (B, 1, ..., 1) matching x's rank (src/mdgen/transport/path.py:4-12)."""
    return t.reshape(t.shape[0], *([1] * (x.ndim - 1)))


class LinearPath:
    """alpha_t = t, sigma_t = 1 - t (src/mdgen/transport/path.py:17-135)."""

    def alpha(self, t):
        return t, jnp.ones_like(t)

    def sigma(self, t):
        return 1 - t, -jnp.ones_like(t)

    def d_alpha_alpha_ratio(self, t):
        return 1 / t

    # -- shared derived quantities (identical algebra across paths) ---------
    def drift(self, x, t):
        """Score-parametrized SDE drift; returns (-drift_mean, diffusion_var)."""
        ratio = self.d_alpha_alpha_ratio(t)
        sigma_t, d_sigma_t = self.sigma(t)
        return -ratio * x, ratio * sigma_t**2 - sigma_t * d_sigma_t

    def diffusion(self, x, t, form="SBDM", norm=1.0):
        if form == "constant":
            return jnp.full_like(t, norm)
        if form == "SBDM":
            return norm * self.drift(x, t)[1]
        if form == "sigma":
            return norm * self.sigma(t)[0]
        if form == "linear":
            return norm * (1 - t)
        if form == "decreasing":
            return 0.25 * (norm * jnp.cos(jnp.pi * t) + 1) ** 2
        if form == "increasing-decreasing":
            return norm * jnp.sin(jnp.pi * t) ** 2
        raise NotImplementedError(form)

    def score_from_velocity(self, velocity, x, t):
        alpha_t, d_alpha_t = self.alpha(t)
        sigma_t, d_sigma_t = self.sigma(t)
        r = alpha_t / d_alpha_t
        var = sigma_t**2 - r * d_sigma_t * sigma_t
        return (r * velocity - x) / var

    def noise_from_velocity(self, velocity, x, t):
        alpha_t, d_alpha_t = self.alpha(t)
        sigma_t, d_sigma_t = self.sigma(t)
        r = alpha_t / d_alpha_t
        var = r * d_sigma_t - sigma_t
        return (r * velocity - x) / var

    def velocity_from_score(self, score, x, t):
        drift, var = self.drift(x, t)
        return var * score - drift

    def interpolate(self, t, x0, x1):
        """Returns (x_t, u_t): the noisy sample and the target vector field."""
        alpha_t, d_alpha_t = self.alpha(t)
        sigma_t, d_sigma_t = self.sigma(t)
        xt = alpha_t * x1 + sigma_t * x0
        ut = d_alpha_t * x1 + d_sigma_t * x0
        return xt, ut


class GVPPath(LinearPath):
    """alpha_t = sin(pi t / 2), sigma_t = cos(pi t / 2) — the reference default
    (src/mdgen/transport/path.py:173-191, parsing.py:100)."""

    def alpha(self, t):
        return jnp.sin(t * math.pi / 2), math.pi / 2 * jnp.cos(t * math.pi / 2)

    def sigma(self, t):
        return jnp.cos(t * math.pi / 2), -math.pi / 2 * jnp.sin(t * math.pi / 2)

    def d_alpha_alpha_ratio(self, t):
        return math.pi / (2 * jnp.tan(t * math.pi / 2))


class VPPath(LinearPath):
    """Variance-preserving diffusion path (src/mdgen/transport/path.py:138-170)."""

    def __init__(self, sigma_min=0.1, sigma_max=20.0):
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max

    def _log_mean_coeff(self, t):
        return -0.25 * (1 - t) ** 2 * (self.sigma_max - self.sigma_min) - 0.5 * (1 - t) * self.sigma_min

    def _d_log_mean_coeff(self, t):
        return 0.5 * (1 - t) * (self.sigma_max - self.sigma_min) + 0.5 * self.sigma_min

    def alpha(self, t):
        a = jnp.exp(self._log_mean_coeff(t))
        return a, a * self._d_log_mean_coeff(t)

    def sigma(self, t):
        p = 2 * self._log_mean_coeff(t)
        sigma_t = jnp.sqrt(1 - jnp.exp(p))
        d_sigma_t = jnp.exp(p) * (2 * self._d_log_mean_coeff(t)) / (-2 * sigma_t)
        return sigma_t, d_sigma_t

    def d_alpha_alpha_ratio(self, t):
        return self._d_log_mean_coeff(t)

    def drift(self, x, t):
        beta_t = self.sigma_min + (1 - t) * (self.sigma_max - self.sigma_min)
        return -0.5 * beta_t * x, beta_t / 2


def get_path(name: str) -> LinearPath:
    return {"Linear": LinearPath, "GVP": GVPPath, "VP": VPPath}[name]()
