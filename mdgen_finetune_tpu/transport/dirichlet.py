"""Dirichlet conditional flow for simplex-valued (sequence design) channels.

Device-resident rebuild of the reference's DirichletConditionalFlow
(src/mdgen/utils.py:33-57). The reference computes the c-factor on the host
with scipy every ODE step (src/mdgen/model/latent_model.py:310-311), forcing a
device->host sync per step; here the incomplete-beta derivative table is
precomputed once at init and the per-step lookup is a pure-jnp gather +
interpolation, so the whole sampler stays on-device.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy import special as sp_special


def simplex_proj(seq: jnp.ndarray) -> jnp.ndarray:
    """Euclidean projection onto the probability simplex (sorted algorithm,
    Wang & Carreira-Perpinan 2013; src/mdgen/utils.py:17-31)."""
    K = seq.shape[-1]
    x = jnp.sort(seq, axis=-1)[..., ::-1]
    cumsum = jnp.cumsum(x, axis=-1) - 1
    div = jnp.arange(1, K + 1, dtype=seq.dtype)
    tmp = cumsum / div
    gt = jnp.sum(x > tmp, axis=-1, keepdims=True)
    tau = jnp.take_along_axis(tmp, gt - 1, axis=-1)
    return jnp.maximum(seq - tau, 0.0)


class DirichletConditionalFlow:
    """Precomputed d/dalpha of I_x(alpha, K-1) on an (alpha, b) grid."""

    def __init__(self, K: int = 20, alpha_min: float = 1.0, alpha_max: float = 100.0, alpha_spacing: float = 0.01):
        self.K = K
        self.alpha_min = alpha_min
        self.alpha_max = alpha_max
        self.alpha_spacing = alpha_spacing
        alphas = np.arange(alpha_min, alpha_max + alpha_spacing, alpha_spacing)
        bs = np.linspace(0, 1, 1000)
        cdfs = sp_special.betainc(alphas[:, None], K - 1, bs[None, :])
        self._alphas = jnp.asarray(alphas, jnp.float32)
        self._bs = jnp.asarray(bs, jnp.float32)
        self._dcdf = jnp.asarray(np.diff(cdfs, axis=0) / alpha_spacing, jnp.float32)

    @functools.partial(jax.jit, static_argnums=0)
    def c_factor(self, bs: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
        """c-factor field (src/mdgen/utils.py:45-57); ``alpha`` a traced scalar."""
        K = self.K
        alpha = jnp.clip(alpha, self.alpha_min, self.alpha_max - self.alpha_spacing)
        # exact Beta(alpha, K-1) via log-gammas — no host scipy call
        log_beta = (
            jax.lax.lgamma(alpha) + jax.lax.lgamma(jnp.asarray(K - 1.0)) - jax.lax.lgamma(alpha + K - 1.0)
        )
        beta_val = jnp.exp(log_beta)
        beta_div = jnp.where(bs < 1, beta_val / jnp.power(1 - bs, K - 1), 0.0)
        pow_term = jnp.power(bs, alpha - 1)
        beta_div_full = jnp.where(pow_term > 0, beta_div / pow_term, 0.0)

        idx = jnp.clip(
            jnp.round((alpha - self.alpha_min) / self.alpha_spacing).astype(jnp.int32),
            0,
            self._dcdf.shape[0] - 1,
        )
        row = jax.lax.dynamic_index_in_dim(self._dcdf, idx, axis=0, keepdims=False)
        interp = -jnp.interp(bs, self._bs, row)
        return interp * beta_div_full
