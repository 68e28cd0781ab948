"""Posterior/prior GFlowNet diffusion sampler as a single lax.scan.

Rebuild of PosteriorPriorDGFN.sample_fwd (src/models/samplers.py:380-486):
twin DDPM policies — a frozen prior and a LoRA posterior — step the same
chain; the posterior reuses the prior's realized noise, and the scan carries
exact Normal log-probs of the realized transitions for the prior forward
policy, the posterior forward policy, and the fixed backward (noising) policy.
The trajectory is stop-gradient'd (reference .detach() semantics) so gradients
flow only through the posterior's mean/std at each step.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .scheduler import DDPMGFNScheduler, normal_logprob


@dataclasses.dataclass
class PosteriorPriorDGFN:
    scheduler: DDPMGFNScheduler
    prior_fn: Callable  # (x, t, condition) -> model_output  (frozen)
    posterior_fn: Callable  # (lora, x, t, condition) -> model_output
    dim: tuple  # per-sample latent shape, e.g. (T, L, D)
    sampling_length: int = 100
    xT_type: str = "gaussian"

    def __post_init__(self):
        self.scheduler.set_timesteps(self.sampling_length)

    # ------------------------------------------------------------------
    def _xT_sample(self, key, batch_size):
        shape = (batch_size, *self.dim)
        if self.xT_type == "uniform":
            x = jax.random.uniform(key, shape, minval=-3.0, maxval=3.0)
            logp = jnp.full((batch_size,), -math.log(6.0) * int(np.prod(self.dim)))
        else:
            x = jax.random.normal(key, shape)
            logp = normal_logprob(x, jnp.zeros_like(x), jnp.ones_like(x))
        return x, logp

    def _xT_logprob(self, x):
        B = x.shape[0]
        if self.xT_type == "uniform":
            return jnp.full((B,), -math.log(6.0) * int(np.prod(self.dim)))
        return normal_logprob(x, jnp.zeros_like(x), jnp.ones_like(x))

    # ------------------------------------------------------------------
    def sample_fwd(
        self,
        key: jax.Array,
        lora: dict,
        condition: dict,
        batch_size: int,
        x_start: Optional[jnp.ndarray] = None,
        detach_freq: float = 0.0,
        sample_from_prior: bool = False,
        save_traj: bool = False,
    ) -> dict:
        """Returns {x, logpf_posterior, logpf_prior, logpb} (+ traj when
        ``save_traj``: (S+1, B, *dim) states, xT first)."""
        sched = self.scheduler
        k_init, k_detach, k_scan = jax.random.split(key, 3)

        if x_start is None:
            x, logp0 = self._xT_sample(k_init, batch_size)
        else:
            x = x_start
            logp0 = self._xT_logprob(x)

        xT = x
        timesteps = jnp.asarray(sched.timesteps)
        n_steps = len(sched.timesteps)
        n_detach = int(n_steps * detach_freq)
        detach_flags = jnp.zeros((n_steps,), bool)
        if n_detach:
            idx = jax.random.choice(k_detach, n_steps, (n_detach,), replace=False)
            detach_flags = detach_flags.at[idx].set(True)
        keys = jax.random.split(k_scan, n_steps)

        def body(carry, inp):
            x, lpf_prior, lpf_post, lpb = carry
            t, k, detach = inp
            t_next = sched.next_timestep(t)  # reference steps from next_timestep(t) (samplers.py:435)

            prior_out = jax.lax.stop_gradient(self.prior_fn(x, t_next, condition))
            pr = sched.step(prior_out, t_next, x, key=k, xT_type=self.xT_type)
            pr = jax.lax.stop_gradient(pr)

            post_out = self.posterior_fn(lora, x, t_next, condition)
            post_out = jnp.where(detach, jax.lax.stop_gradient(post_out), post_out)
            po = sched.step(post_out, t_next, x, noise=pr["noise"])

            new_x = jax.lax.stop_gradient(
                pr["prev_sample"] if sample_from_prior else po["prev_sample"]
            )

            lpf_prior = lpf_prior + normal_logprob(new_x, pr["posterior_mean"], pr["posterior_std"])
            lpf_post = lpf_post + normal_logprob(new_x, po["posterior_mean"], po["posterior_std"])

            _, pb_mean, pb_std = sched.step_noise(new_x, xT, t=sched.next_timestep(t))
            lpb = lpb + normal_logprob(x, jax.lax.stop_gradient(pb_mean), pb_std)

            return (new_x, lpf_prior, lpf_post, lpb), (new_x if save_traj else None)

        carry = (x, logp0, logp0, jnp.zeros_like(logp0))
        (x, lpf_prior, lpf_post, lpb), ys = jax.lax.scan(body, carry, (timesteps, keys, detach_flags))
        out = {"x": x, "logpf_prior": lpf_prior, "logpf_posterior": lpf_post, "logpb": lpb}
        if save_traj:
            out["traj"] = jnp.concatenate([xT[None], ys], axis=0)  # (S+1, B, *dim)
        return out

    # ------------------------------------------------------------------
    def sample_bkw(self, key: jax.Array, lora: dict, condition: dict, x: jnp.ndarray) -> dict:
        """Backward (noising) trajectory from terminal x, re-evaluating forward
        log-probs along it (src/models/samplers.py:488-578 semantics)."""
        sched = self.scheduler
        timesteps = jnp.asarray(sched.timesteps[::-1].copy())  # ascending: clean -> noise
        n_steps = len(sched.timesteps)
        keys = jax.random.split(key, n_steps)

        def body(carry, inp):
            x_cur, lpb, lpf_post = carry
            t, k = inp
            t_next = sched.next_timestep(t)
            noise = jax.random.normal(k, x_cur.shape)
            x_noised, pb_mean, pb_std = sched.step_noise(x_cur, noise, t=t_next)
            lpb = lpb + normal_logprob(jax.lax.stop_gradient(x_noised), pb_mean, pb_std)

            post_out = self.posterior_fn(lora, x_noised, t_next, condition)
            po = sched.step(post_out, t_next, x_noised, noise=jnp.zeros_like(x_cur))
            lpf_post = lpf_post + normal_logprob(
                jax.lax.stop_gradient(x_cur), po["posterior_mean"], po["posterior_std"]
            )
            return (jax.lax.stop_gradient(x_noised), lpb, lpf_post), None

        zero = jnp.zeros((x.shape[0],))
        (xT, lpb, lpf_post), _ = jax.lax.scan(body, (x, zero, zero), (timesteps, keys))
        lpf_post = lpf_post + self._xT_logprob(xT)
        return {"xT": xT, "logpb": lpb, "logpf_posterior": lpf_post}


    # ------------------------------------------------------------------
    def replay_logpf(self, lora: dict, condition: dict, xs: jnp.ndarray, ts: jnp.ndarray, targets: jnp.ndarray):
        """Posterior log-probs of stored transitions with target-forced noise
        (src/models/samplers.py:686-742 batched_train inner step).

        xs, targets: (m, B, *dim) chunk of trajectory states and their
        successors; ts: (m,) integer timesteps. The scheduler's ``target``
        mode recovers exactly the noise that reproduced the stored next state,
        so the Normal log-prob is of the realized transition. Returns (m*B,).
        """
        m, B = xs.shape[:2]
        flat = xs.reshape(m * B, *xs.shape[2:])
        tgt = targets.reshape(m * B, *targets.shape[2:])
        t_vec = jnp.repeat(ts, B)
        cond = jax.tree.map(lambda v: jnp.concatenate([v] * m, axis=0), condition)
        out = self.posterior_fn(lora, flat, t_vec, cond)
        po = self.scheduler.step(out, t_vec, flat, target=tgt)
        return normal_logprob(jax.lax.stop_gradient(po["prev_sample"]), po["posterior_mean"], po["posterior_std"])

    # ------------------------------------------------------------------
    def sample_back_and_forth(
        self, key: jax.Array, lora: dict, condition: dict, x: jnp.ndarray, noise_level: float = 0.5
    ) -> dict:
        """Partially renoise terminal samples, then resample forward — local
        exploration around good samples. The reference's implementation is
        broken (undefined ``normal_dist``, src/models/samplers.py:653-654);
        this is the working equivalent built from step_noise + sample_fwd.
        """
        sched = self.scheduler
        k_noise, k_fwd = jax.random.split(key)
        n_back = max(int(len(sched.timesteps) * noise_level), 1)
        t_mid = int(np.asarray(sched.timesteps)[len(sched.timesteps) - n_back])
        noise = jax.random.normal(k_noise, x.shape)
        x_mid = sched.add_noise(x, noise, jnp.full((x.shape[0],), t_mid))
        # resume the forward (denoising) chain from t_mid
        res = self.sample_fwd(k_fwd, lora, condition, x.shape[0], x_start=x_mid)
        res["t_mid"] = t_mid
        return res


def rtb_loss(logpf_posterior, logZ, log_pf_prior_or_pb, logr, learning_cutoff: float = 0.0):
    """Relative trajectory balance loss (src/rtb_utils/gfn_diffusion.py:459-460)."""
    return 0.5 * jax.nn.relu(
        (logpf_posterior + logZ - log_pf_prior_or_pb - logr) ** 2 - learning_cutoff
    )


def vargrad_logz(logpf_posterior, log_pf_prior_or_pb, logr):
    """Per-sample logZ estimate for the VarGrad objective
    (src/rtb_utils/gfn_diffusion.py:438-456)."""
    return jax.lax.stop_gradient(-logpf_posterior + log_pf_prior_or_pb + logr)
