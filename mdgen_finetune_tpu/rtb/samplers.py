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
    # Optional Langevin reward-gradient correction added to the policy output
    # before the scheduler step (src/models/samplers.py:120-171 HGFNode
    # run_policy + scheduling_ddim_gfn.py:418 `model_output += correction`).
    # Signature: langevin_fn(x, t) -> correction with the shape of the model
    # output; typically scale * clip(grad_x log_r(decode(x))). Applied to both
    # policies as in the reference's add_langevin (samplers.py:365-367); the
    # prior branch is stop-gradient'd anyway.
    langevin_fn: Optional[Callable] = None

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
        detach_cut_off: float = 1.0,
        sample_from_prior: bool = False,
        save_traj: bool = False,
        timesteps: Optional[np.ndarray] = None,
        include_x_start_logp: bool = True,
    ) -> dict:
        """Returns {x, logpf_posterior, logpf_prior, logpb} (+ traj when
        ``save_traj``: (S+1, B, *dim) states, xT first).

        ``detach_cut_off``: additionally detach all steps with
        t > detach_cut_off * num_train_timesteps (src/models/samplers.py:426-427).
        ``timesteps``: override the scheduler's (descending) timestep list —
        used for partial chains in back-and-forth exploration.
        ``include_x_start_logp``: count the xT prior density in the forward
        log-probs (skip for partial chains whose start is not the terminal
        noise state).
        """
        sched = self.scheduler
        k_init, k_detach, k_scan = jax.random.split(key, 3)

        if x_start is None:
            x, logp0 = self._xT_sample(k_init, batch_size)
        else:
            x = x_start
            logp0 = self._xT_logprob(x)
        if not include_x_start_logp:
            logp0 = jnp.zeros((x.shape[0],))

        xT = x
        ts_host = sched.timesteps if timesteps is None else np.asarray(timesteps)
        timesteps = jnp.asarray(ts_host)
        n_steps = len(ts_host)
        n_detach = int(n_steps * detach_freq)
        detach_flags = jnp.zeros((n_steps,), bool)
        if n_detach:
            idx = jax.random.choice(k_detach, n_steps, (n_detach,), replace=False)
            detach_flags = detach_flags.at[idx].set(True)
        if detach_cut_off < 1.0:
            detach_flags = jnp.logical_or(
                detach_flags, timesteps > detach_cut_off * sched.num_train_timesteps
            )
        keys = jax.random.split(k_scan, n_steps)

        def body(carry, inp):
            x, lpf_prior, lpf_post, lpb = carry
            t, k, detach = inp
            t_next = sched.next_timestep(t)  # reference steps from next_timestep(t) (samplers.py:435)

            # Langevin reward-gradient correction: shift the step MEAN of both
            # policies by scale * grad_x log r (the reference adds its
            # correction to the policy output, scheduling_ddim_gfn.py:418; in
            # v-prediction space that flips sign through x0 = sqrt(a)x -
            # sqrt(b)v, so we apply the equivalent mean-space shift). The fn is
            # responsible for stop-gradienting the reward gradient itself.
            lgv = self.langevin_fn(x, t_next) if self.langevin_fn is not None else 0.0

            prior_out = jax.lax.stop_gradient(self.prior_fn(x, t_next, condition))
            pr = sched.step(prior_out, t_next, x, key=k, xT_type=self.xT_type)
            pr = jax.lax.stop_gradient(pr)
            pr = {**pr, "prev_sample": pr["prev_sample"] + jax.lax.stop_gradient(lgv),
                  "posterior_mean": pr["posterior_mean"] + jax.lax.stop_gradient(lgv)}

            post_out = self.posterior_fn(lora, x, t_next, condition)
            post_out = jnp.where(detach, jax.lax.stop_gradient(post_out), post_out)
            po = sched.step(post_out, t_next, x, noise=pr["noise"])
            po = {**po, "prev_sample": po["prev_sample"] + lgv,
                  "posterior_mean": po["posterior_mean"] + lgv}

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
    def sample_bkw(
        self,
        key: jax.Array,
        lora: dict,
        condition: dict,
        x: jnp.ndarray,
        detach_freq: float = 0.0,
        timesteps: Optional[np.ndarray] = None,
        include_xT_logp: bool = True,
    ) -> dict:
        """Backward (noising) trajectory from terminal x, re-evaluating the
        posterior AND prior forward log-probs along it
        (src/models/samplers.py:488-578).

        Per the reference, each backward state is a fresh marginal noising of
        the *clean* sample (scheduler.add_noise(x_start, noise, t_next)), not a
        progressive chain; logpb accumulates the Normal log-prob of that draw,
        and both policies are evaluated at the noised state to score the
        previous (less-noised) state under their forward kernels. This is the
        replay-buffer training path's trajectory sampler.
        """
        sched = self.scheduler
        k_scan, k_detach = jax.random.split(key)
        ts_host = sched.timesteps if timesteps is None else np.asarray(timesteps)
        timesteps = jnp.asarray(ts_host[::-1].copy())  # ascending: clean -> noise
        n_steps = len(ts_host)
        n_detach = int(n_steps * detach_freq)
        detach_flags = jnp.zeros((n_steps,), bool)
        if n_detach:
            idx = jax.random.choice(k_detach, n_steps, (n_detach,), replace=False)
            detach_flags = detach_flags.at[idx].set(True)
        keys = jax.random.split(k_scan, n_steps)
        x_start = x

        def body(carry, inp):
            x_cur, lpb, lpf_post, lpf_prior = carry
            t, k, detach = inp
            t_next = sched.next_timestep(t)
            noise = jax.random.normal(k, x_cur.shape)
            x_noised, pb_mean, pb_std = sched.add_noise(
                x_start, noise, jnp.full((x.shape[0],), t_next), return_std=True
            )
            x_noised = jax.lax.stop_gradient(x_noised)
            lpb = lpb + normal_logprob(x_noised, pb_mean, self._bc_std(pb_std, x_noised))

            post_out = self.posterior_fn(lora, x_noised, t_next, condition)
            post_out = jnp.where(detach, jax.lax.stop_gradient(post_out), post_out)
            po = sched.step(post_out, t_next, x_noised, noise=jnp.zeros_like(x_cur))
            lpf_post = lpf_post + normal_logprob(
                jax.lax.stop_gradient(x_cur), po["posterior_mean"], po["posterior_std"]
            )

            prior_out = jax.lax.stop_gradient(self.prior_fn(x_noised, t_next, condition))
            pr = sched.step(prior_out, t_next, x_noised, noise=jnp.zeros_like(x_cur))
            lpf_prior = lpf_prior + normal_logprob(
                jax.lax.stop_gradient(x_cur),
                jax.lax.stop_gradient(pr["posterior_mean"]),
                jax.lax.stop_gradient(pr["posterior_std"]),
            )
            return (x_noised, lpb, lpf_post, lpf_prior), None

        zero = jnp.zeros((x.shape[0],))
        (xT, lpb, lpf_post, lpf_prior), _ = jax.lax.scan(
            body, (x, zero, zero, zero), (timesteps, keys, detach_flags)
        )
        if include_xT_logp:
            lpf_post = lpf_post + self._xT_logprob(xT)
            lpf_prior = lpf_prior + self._xT_logprob(xT)
        return {
            "x": x_start,
            "xT": xT,
            "logpb": lpb,
            "logpf_posterior": lpf_post,
            "logpf_prior": lpf_prior,
        }

    @staticmethod
    def _bc_std(std, x):
        if jnp.ndim(std) == 1:
            return std.reshape((-1,) + (1,) * (x.ndim - 1))
        return std


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
        """Back-and-forth local exploration (src/models/samplers.py:580-660):
        noise good terminal samples backward over the last ``noise_level``
        fraction of the chain (scoring both policies along the way), then
        resample forward over the same partial chain. The reference's own
        implementation is broken (undefined ``normal_dist``, ignored
        ``backward=`` kwarg); this is the working equivalent with the same
        return contract: x (input), x_prime (resampled), and the four
        backward/forward policy log-probs for a local, logZ-free RTB loss.
        """
        sched = self.scheduler
        k_bkw, k_fwd = jax.random.split(key)
        ts = np.asarray(sched.timesteps)  # descending T-1 .. 0
        n_back = min(max(int(len(ts) * noise_level), 1), len(ts))
        partial_ts = ts[len(ts) - n_back :]  # low-t tail of the chain

        bkw = self.sample_bkw(
            k_bkw, lora, condition, x, timesteps=partial_ts, include_xT_logp=False
        )
        fwd = self.sample_fwd(
            k_fwd, lora, condition, x.shape[0],
            x_start=bkw["xT"], timesteps=partial_ts, include_x_start_logp=False,
        )
        return {
            "x": x,
            "x_prime": fwd["x"],
            "t_mid": int(partial_ts[0]),
            "logpf_posterior_b": bkw["logpf_posterior"],
            "logpf_prior_b": bkw["logpf_prior"],
            "logpb_b": bkw["logpb"],
            "logpf_posterior_f": fwd["logpf_posterior"],
            "logpf_prior_f": fwd["logpf_prior"],
            "logpb_f": fwd["logpb"],
        }


@dataclasses.dataclass
class PosteriorPriorBaselineSampler:
    """Training-free guidance baseline (DPS / FPS-style), rebuilt from
    src/models/samplers.py:1016-1175 ``PosteriorPriorBaselineSampler``.

    Each ancestral step runs the FROZEN prior policy, forms the posterior-mean
    x0 estimate (``pred_original_sample``), differentiates a reward objective
    through it w.r.t. the current state, and shifts the step by
    ``scale * grad`` — no fine-tuning. With ``mc=True`` the objective is a
    logsumexp over ``particles`` noise-perturbed x0 estimates (FPS-style
    smoothing, reference :1122-1143); otherwise plain DPS (:1144-1156).
    Accumulates logpf under the guided (posterior) and unguided (prior) means
    so downstream RTB-style diagnostics keep working.
    """

    scheduler: DDPMGFNScheduler
    prior_fn: Callable  # (x, t, condition) -> model_output (frozen)
    dim: tuple
    sampling_length: int = 100
    xT_type: str = "gaussian"
    scale: float = 1.0
    mc: bool = False
    particles: int = 10

    def __post_init__(self):
        self.scheduler.set_timesteps(self.sampling_length)

    def sample(
        self,
        key: jax.Array,
        condition: dict,
        batch_size: int,
        log_reward_fn: Optional[Callable] = None,  # x0_hat -> (B,) objective to maximize
        sample_from_prior: bool = False,
    ) -> dict:
        sched = self.scheduler
        k_init, k_scan = jax.random.split(key)
        shape = (batch_size, *self.dim)
        if self.xT_type == "uniform":
            x = jax.random.uniform(k_init, shape, minval=-3.0, maxval=3.0)
            logp0 = jnp.full((batch_size,), -math.log(6.0) * int(np.prod(self.dim)))
        else:
            x = jax.random.normal(k_init, shape)
            logp0 = normal_logprob(x, jnp.zeros_like(x), jnp.ones_like(x))
        guided = (not sample_from_prior) and log_reward_fn is not None

        timesteps = jnp.asarray(sched.timesteps)
        keys = jax.random.split(k_scan, len(sched.timesteps))

        def objective(xc, t, k):
            """Scalar reward objective of the x0 estimate at (xc, t)."""
            out = self.prior_fn(xc, t, condition)
            x0_hat = sched.pred_x0(out, t, xc)
            if self.mc:
                var = sched.get_variance(t)
                std = var if sched.variance_type == "fixed_small_log" else var**0.5
                r_t = std / jnp.sqrt(1 + std**2)
                pk = jax.random.split(k, self.particles)
                vals = jnp.stack([
                    log_reward_fn(x0_hat + jax.random.normal(pk[i], x0_hat.shape) * r_t)
                    for i in range(self.particles)
                ])  # (P, B)
                return jnp.sum(jax.nn.logsumexp(vals, axis=0) - math.log(self.particles))
            return jnp.sum(log_reward_fn(x0_hat))

        def body(carry, inp):
            x, lpf_post, lpf_prior = carry
            t, k = inp
            k_step, k_mc = jax.random.split(k)
            out = self.prior_fn(x, t, condition)
            res = sched.step(out, t, x, key=k_step, xT_type=self.xT_type)
            if guided:
                g = jax.grad(objective)(x, t, k_mc)
                g = jnp.nan_to_num(g)
                new_x = res["prev_sample"] + g * self.scale
                lpf_post = lpf_post + normal_logprob(
                    new_x, res["posterior_mean"] + g * self.scale, res["posterior_std"]
                )
                lpf_prior = lpf_prior + normal_logprob(
                    new_x, res["posterior_mean"], res["posterior_std"]
                )
            else:
                new_x = res["prev_sample"]
                lp = normal_logprob(new_x, res["posterior_mean"], res["posterior_std"])
                lpf_post = lpf_post + lp
                lpf_prior = lpf_prior + lp
            return (jax.lax.stop_gradient(new_x), lpf_post, lpf_prior), None

        (x, lpf_post, lpf_prior), _ = jax.lax.scan(body, (x, logp0, logp0), (timesteps, keys))
        return {"x": x, "logpf_posterior": lpf_post, "logpf_prior": lpf_prior}


def back_and_forth_loss(res: dict, logr_x, logr_x_prime, learning_cutoff: float = 0.0):
    """Local, logZ-free RTB loss on a back-and-forth pair: the full-chain RTB
    constraints of the two trajectories (old terminal x, resampled x') share
    the prefix up to the renoised midpoint, so subtracting them cancels logZ
    and the prefix — only the partial-segment forward log-probs remain.
    Both segments' log-probs are forward-kernel evaluations (sample_bkw scores
    the forward kernels along the backward-visited states)."""
    delta_f = res["logpf_posterior_f"] - res["logpf_prior_f"] - logr_x_prime
    delta_b = res["logpf_posterior_b"] - res["logpf_prior_b"] - logr_x
    return 0.5 * jax.nn.relu((delta_f - delta_b) ** 2 - learning_cutoff)


def rtb_loss(logpf_posterior, logZ, log_pf_prior_or_pb, logr, learning_cutoff: float = 0.0):
    """Relative trajectory balance loss (src/rtb_utils/gfn_diffusion.py:459-460)."""
    return 0.5 * jax.nn.relu(
        (logpf_posterior + logZ - log_pf_prior_or_pb - logr) ** 2 - learning_cutoff
    )


def vargrad_logz(logpf_posterior, log_pf_prior_or_pb, logr):
    """Per-sample logZ estimate for the VarGrad objective
    (src/rtb_utils/gfn_diffusion.py:438-456)."""
    return jax.lax.stop_gradient(-logpf_posterior + log_pf_prior_or_pb + logr)
