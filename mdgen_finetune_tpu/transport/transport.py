"""Flow-matching training losses and drift/score wrappers.

Functional rebuild of the SiT transport (src/mdgen/transport/transport.py).
``training_losses`` is a pure function of (params-closed model_fn, rng, batch)
so the whole thing jits into the train step. Dirichlet flow-matching for
sequence design (src/mdgen/transport/transport.py:160-171,208-219) is included.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..config import MDGenConfig
from .paths import expand_t, get_path


def t_to_alpha(t, alpha_max: float):
    """Linear schedule 1 -> alpha_max for the Dirichlet concentration
    (src/mdgen/transport/transport.py:52-57)."""
    return 1 * (1 - t) + t * alpha_max, (alpha_max - 1)


def mean_flat(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean over all non-batch dims (src/mdgen/transport/transport.py:12-16)."""
    axes = tuple(range(1, x.ndim))
    return jnp.sum(x * mask, axis=axes) / jnp.sum(mask, axis=axes)


def _sample_dirichlet(key, alphas):
    return jax.random.dirichlet(key, alphas)


class Transport:
    """Holds path + prediction-type config; all methods are pure."""

    def __init__(self, cfg: MDGenConfig):
        self.cfg = cfg
        self.path = get_path(cfg.transport.path_type)
        self.prediction = cfg.transport.prediction
        self.train_eps, self.sample_eps = self._default_eps()

    def _default_eps(self):
        pt, pred = self.cfg.transport.path_type, self.cfg.transport.prediction
        if pt == "VP":
            return (
                self.cfg.transport.train_eps or 1e-5,
                self.cfg.transport.sample_eps or 1e-3,
            )
        if pred != "velocity":
            return (self.cfg.transport.train_eps or 1e-3, self.cfg.transport.sample_eps or 1e-3)
        return 0.0, 0.0

    def check_interval(self, *, sde: bool = False, eval: bool = False, last_step_size: float = 0.0):
        """Integration interval endpoints (src/mdgen/transport/transport.py:94-123)."""
        t0, t1 = 0.0, 1.0
        eps = self.sample_eps if eval else self.train_eps
        if self.cfg.transport.path_type == "VP":
            t1 = 1 - eps if (not sde or last_step_size == 0) else 1 - last_step_size
        elif self.prediction != "velocity" or sde:
            t0 = eps if sde or self.prediction != "velocity" else 0.0
            t1 = 1 - eps if (not sde or last_step_size == 0) else 1 - last_step_size
        return t0, t1

    # ------------------------------------------------------------------
    def training_losses(
        self,
        model_fn: Callable,
        key: jax.Array,
        x1: jnp.ndarray,
        aatype1: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        model_kwargs: Optional[dict] = None,
    ) -> dict:
        """Velocity-matching (+ optional Dirichlet-FM discrete) loss.

        Mirrors src/mdgen/transport/transport.py:137-222. ``model_fn`` is the
        denoiser with params already bound: model_fn(x, t, **kwargs) -> output.
        """
        cfg = self.cfg
        model_kwargs = model_kwargs or {}
        k_t, k_x0, k_dir = jax.random.split(key, 3)

        B = x1.shape[0]
        x0 = jax.random.normal(k_x0, x1.shape, dtype=x1.dtype)
        t0, t1 = self.check_interval()
        t = jax.random.uniform(k_t, (B,), dtype=x1.dtype) * (t1 - t0) + t0

        te = expand_t(t, x1)
        xt, ut = self.path.interpolate(te, x0, x1)

        if cfg.task.design:
            assert self.prediction == "velocity"
            if cfg.task.dynamic_mpnn or cfg.task.mpnn:
                t = jnp.ones_like(t)
                x_d = jnp.zeros((B, 1, x1.shape[2], 20), dtype=x1.dtype)
                x_d = jnp.broadcast_to(x_d, (B, xt.shape[1], x1.shape[2], 20))
            else:
                seq_one_hot = jax.nn.one_hot(aatype1, 20, dtype=x1.dtype)  # (B, L, 20)
                alphas, _ = t_to_alpha(t, cfg.transport.alpha_max)
                alphas = 1 + seq_one_hot * (alphas[:, None, None] - 1)
                x_d = _sample_dirichlet(k_dir, alphas)  # (B, L, 20)
                x_d = jnp.broadcast_to(x_d[:, None], (B, xt.shape[1], *x_d.shape[1:]))
            xt = jnp.concatenate([xt, x_d], axis=-1)

        model_output = model_fn(xt, t, **model_kwargs)

        terms = {"t": t}
        logits = None
        if cfg.task.design and not (cfg.task.dynamic_mpnn or cfg.task.mpnn):
            logits = model_output[..., -20:]
            model_output = model_output[..., :-20]
        terms["pred"] = model_output

        if not (cfg.task.dynamic_mpnn or cfg.task.mpnn):
            if self.prediction == "velocity":
                terms["loss"] = mean_flat((model_output - ut) ** 2, mask)
            else:
                sigma_t, _ = self.path.sigma(te)
                # WeightType weighting for noise/score objectives
                # (src/mdgen/transport/transport.py:190-201)
                lw = cfg.transport.loss_weight
                if lw == "velocity":
                    _, drift_var = self.path.drift(xt, te)
                    weight = (drift_var / sigma_t) ** 2
                elif lw == "likelihood":
                    _, drift_var = self.path.drift(xt, te)
                    weight = drift_var / (sigma_t**2)
                elif lw == "none":
                    weight = 1.0
                else:
                    raise NotImplementedError(f"loss_weight={lw}")
                if self.prediction == "noise":
                    terms["loss"] = mean_flat(weight * (model_output - x0) ** 2, mask)
                else:  # score
                    terms["loss"] = mean_flat(weight * (model_output * sigma_t + x0) ** 2, mask)

        if cfg.task.design:
            if cfg.task.dynamic_mpnn or cfg.task.mpnn:
                logits = model_output
                log_p = jax.nn.log_softmax(logits, axis=-1)
                tgt = jnp.broadcast_to(aatype1[:, None, :], logits.shape[:-1])
                loss_d = -jnp.mean(jnp.take_along_axis(log_p, tgt[..., None], axis=-1))
                terms["loss_continuous"] = jnp.full((B,), jnp.nan, dtype=x1.dtype)
                terms["loss"] = loss_d
            else:
                terms["loss_continuous"] = terms["loss"]
                log_p = jax.nn.log_softmax(logits, axis=-1)
                tgt = jnp.broadcast_to(aatype1[:, None, :], logits.shape[:-1])
                loss_d = -jnp.mean(jnp.take_along_axis(log_p, tgt[..., None], axis=-1))
                w = cfg.transport.discrete_loss_weight
                terms["loss"] = loss_d * w + (1 - w) * terms["loss"]
            terms["loss_discrete"] = loss_d
            terms["logits"] = logits
        return terms

    # ------------------------------------------------------------------
    def drift_fn(self, model_fn: Callable) -> Callable:
        """Probability-flow ODE drift (src/mdgen/transport/transport.py:224-257)."""
        if self.prediction == "velocity":
            return lambda x, t, **kw: model_fn(x, t, **kw)

        if self.prediction == "score":

            def score_ode(x, t, **kw):
                te = expand_t(t, x)
                drift_mean, drift_var = self.path.drift(x, te)
                return -drift_mean + drift_var * model_fn(x, t, **kw)

            return score_ode

        def noise_ode(x, t, **kw):
            te = expand_t(t, x)
            drift_mean, drift_var = self.path.drift(x, te)
            sigma_t, _ = self.path.sigma(te)
            score = model_fn(x, t, **kw) / -sigma_t
            return -drift_mean + drift_var * score

        return noise_ode

    def score_fn(self, model_fn: Callable) -> Callable:
        """(src/mdgen/transport/transport.py:259-275)"""
        if self.prediction == "noise":
            return lambda x, t, **kw: model_fn(x, t, **kw) / -self.path.sigma(expand_t(t, x))[0]
        if self.prediction == "score":
            return lambda x, t, **kw: model_fn(x, t, **kw)
        return lambda x, t, **kw: self.path.score_from_velocity(model_fn(x, t, **kw), x, expand_t(t, x))

    def make_sde_sampler(
        self,
        model_fn: Callable,
        *,
        num_steps: int = 250,
        method: str = "Euler",
        diffusion_form: str = "SBDM",
        diffusion_norm: float = 1.0,
        last_step: str = "Mean",
        last_step_size: float = 0.04,
    ) -> Callable:
        """Configured SDE sampler incl. the Tweedie last step, which needs the
        path's alpha/sigma (src/mdgen/transport/transport.py:294-405)."""
        from .samplers import sample_sde

        drift = self.drift_fn(model_fn)
        score = self.score_fn(model_fn)
        diffusion = lambda x, te: self.path.diffusion(x, te, form=diffusion_form, norm=diffusion_norm)
        t0, t1 = self.check_interval(sde=True, eval=True, last_step_size=last_step_size)
        # the score/diffusion terms are singular at t=0 (e.g. GVP's
        # d_alpha/alpha ~ 1/tan); start with a semi-implicit first step
        t0 = max(t0, 1e-3)

        def sample(key, x):
            out = sample_sde(
                drift, diffusion, score, key, x,
                t0=t0, t1=t1, num_steps=num_steps, method=method,
                last_step=last_step if last_step != "Tweedie" else None,
                last_step_size=last_step_size,
            )
            if last_step == "Tweedie":
                tv = jnp.full((x.shape[0],), t1, x.dtype)
                te = expand_t(tv, out)
                alpha, _ = self.path.alpha(te)
                sigma, _ = self.path.sigma(te)
                out = out / alpha + (sigma**2 / alpha) * score(out, tv)
            return out

        return sample

    def prior_logp(self, z: jnp.ndarray) -> jnp.ndarray:
        """Standard-normal prior log density (src/mdgen/transport/transport.py:84-92)."""
        n = z[0].size
        flat = z.reshape(z.shape[0], -1)
        return -n / 2.0 * jnp.log(2 * jnp.pi) - jnp.sum(flat**2, axis=-1) / 2.0


def create_transport(cfg: MDGenConfig) -> Transport:
    return Transport(cfg)
