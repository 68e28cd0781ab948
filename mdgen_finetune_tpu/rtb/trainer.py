"""RTB fine-tuning + prior-distillation trainers.

Rebuild of src/rtb_utils/gfn_diffusion.py:

- ``RTBTrainer`` (:154-543): per iteration — sample conditioning from the
  dataset, run the twin-policy GFN sampler, decode terminal latents through
  the frozen MDGen flow, score with the reward oracle, take an RTB / TB /
  VarGrad gradient step on the LoRA adapter (+ logZ). The sampler + loss +
  grad compile into one jitted step; only the reward (when OpenMM-backed) and
  the replay buffer run host-side.
- ``DiffuserTrainer`` (:605-805): distills the MDGen prior-latent distribution
  into a DDPM denoiser with min-SNR-weighted v-prediction MSE, so the RTB
  chain has exact per-step log-probs.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import MDGenConfig
from ..models import LatentMDGen
from .lora import lora_init, lora_merge
from .priors import MDGenSimulator
from .replay_buffer import ReplayBuffer
from .samplers import PosteriorPriorDGFN, rtb_loss, vargrad_logz
from .scheduler import DDPMGFNScheduler


@dataclasses.dataclass(frozen=True)
class RTBConfig:
    """(src/rtb_utils/args.py:25-126 essentials)"""

    method: str = "rtb"  # rtb | tb
    lr: float = 5e-5
    logz_lr: float = 5e-2
    batch_size: int = 4
    n_iterations: int = 1000
    sampling_length: int = 10
    num_train_timesteps: int = 1000
    xT_type: str = "gaussian"
    vargrad: bool = False
    learning_cutoff: float = 0.1
    detach_freq: float = 0.0
    detach_cut_off: float = 1.0
    lora_rank: int = 32
    replay_buffer: bool = False
    rb_size: int = 1000
    rb_ratio: float = 0.25
    rb_strategy: str = "uniform"  # uniform | reward (1/4 high-reward mix)
    rb_beta: float = 1.0
    prior_sampling: bool = False  # src/rtb_utils/args.py:83-84
    prior_sampling_ratio: float = 0.1
    back_and_forth: bool = False  # src/rtb_utils/args.py:76
    bf_freq: int = 4  # do a back-and-forth exploration step every bf_freq iters
    bf_noise_level: float = 0.5
    langevin: bool = False  # reward-gradient policy correction (samplers.py:120-171)
    lgv_scale: float = 0.01
    lgv_clip: float = 1e2
    grad_clip: float = 1.0
    seed: int = 0
    reward_temperature: float = 1.0


def _latent_manifold_log_reward(x):
    """Default differentiable Langevin proxy over MDGen latents
    (B, T, L, 21[+20]): log-reward is highest when the quaternion block is
    unit-norm and each torsion (cos, sin) pair is unit-norm — i.e. the
    latents decode to valid geometry."""
    quat = x[..., :4]
    q_pen = (jnp.sum(quat * quat, axis=-1) - 1.0) ** 2  # (B, T, L)
    tor = x[..., 7:21].reshape(*x.shape[:-1], 7, 2)
    t_pen = jnp.sum((jnp.sum(tor * tor, axis=-1) - 1.0) ** 2, axis=-1)
    return -jnp.sum(q_pen + t_pen, axis=tuple(range(1, q_pen.ndim)))


class RTBTrainer:
    def __init__(
        self,
        cfg: MDGenConfig,
        rtb: RTBConfig,
        prior_sim: MDGenSimulator,
        reward_fn: Callable,
        policy_params: Optional[dict] = None,
        workdir: str = "workdir/rtb",
        reward_on_device: bool = True,
        lgv_log_reward_fn: Optional[Callable] = None,
        policy: Optional[object] = None,
        lora_targets: Optional[Callable] = None,
    ):
        """``lgv_log_reward_fn``: differentiable latents -> (B,) log-reward
        proxy used for the Langevin correction when rtb.langevin is set (the
        reference's lgv classifier, src/models/samplers.py:120-171; here
        typically the SurrogateReward composed with the on-device decode).

        ``policy``: optional alternative policy module (e.g. an outsourced
        ``UNet3DSeq`` denoiser, src/rtb_utils/denoisers.py:504-561) with the
        apply signature (x, t_normalized, **condition); defaults to the
        LatentMDGen denoiser. ``lora_targets`` overrides which kernels get
        adapters (required for non-MDGen policies whose module names differ).
        """
        self.cfg = cfg
        self.rtb = rtb
        self.prior_sim = prior_sim
        self.reward_fn = reward_fn
        self.workdir = workdir

        # policy network = the denoiser architecture as DDPM v-predictor;
        # the prior policy is its frozen copy, the posterior adds LoRA
        self.policy = policy if policy is not None else LatentMDGen(
            cfg, cfg.latent_dim,
            # flagship compute dtype: the frozen prior was trained bf16 and
            # the f32 trunk kernel VMEM-OOMs at traj_length >= 250 (r4);
            # the RTB log-prob accumulation stays f32 outside the model
            dtype=jnp.bfloat16 if cfg.model.use_bf16 else jnp.float32)
        self.policy_params = policy_params if policy_params is not None else prior_sim.engine.params
        self.scheduler = DDPMGFNScheduler(
            num_train_timesteps=rtb.num_train_timesteps, prediction_type="v_prediction",
            clip_sample=True, clip_sample_range=3.0, variance_type="fixed_large",
        )

        def policy_apply(params, x, t, condition):
            # t is a scalar timestep inside the scan, or (B,) in replay mode
            tt = (jnp.zeros((x.shape[0],), jnp.float32) + t) / rtb.num_train_timesteps
            return self.policy.apply(params, x, tt, **condition)

        def prior_fn(x, t, condition):
            return policy_apply(self.policy_params, x, t, condition)

        def posterior_fn(lora, x, t, condition):
            merged = {**self.policy_params, "params": lora_merge(self.policy_params["params"], lora)}
            return policy_apply(merged, x, t, condition)

        langevin_fn = None
        if rtb.langevin:
            if lgv_log_reward_fn is None:
                # default differentiable proxy: keep latents on the data
                # manifold (unit quaternion block, unit sin/cos torsion
                # pairs) — the role the reference's trained lgv classifier
                # plays (src/models/samplers.py:120-171) when no
                # reward-aligned differentiable function is supplied
                lgv_log_reward_fn = _latent_manifold_log_reward

            def langevin_fn(x, t):
                g = jax.grad(lambda y: jnp.sum(lgv_log_reward_fn(y)))(x)
                g = jnp.nan_to_num(g)
                g = jnp.clip(g, -rtb.lgv_clip, rtb.lgv_clip)
                return rtb.lgv_scale * jax.lax.stop_gradient(g)

        self.sampler = PosteriorPriorDGFN(
            scheduler=self.scheduler,
            prior_fn=prior_fn,
            posterior_fn=posterior_fn,
            dim=prior_sim.latent_shape,
            sampling_length=rtb.sampling_length,
            xT_type=rtb.xT_type,
            langevin_fn=langevin_fn,
        )

        key = jax.random.key(rtb.seed)
        lora_kw = {"targets": lora_targets} if lora_targets is not None else {}
        self.lora = lora_init(key, self.policy_params["params"], rank=rtb.lora_rank, **lora_kw)
        self.logZ = jnp.zeros(())
        self.opt = optax.chain(
            optax.clip_by_global_norm(rtb.grad_clip),
            optax.multi_transform(
                {"lora": optax.adam(rtb.lr), "logZ": optax.adam(rtb.logz_lr)},
                param_labels={"lora": "lora", "logZ": "logZ"},
            ),
        )
        self.opt_state = self.opt.init({"lora": self.lora, "logZ": self.logZ})
        self.replay = (
            ReplayBuffer(rtb.rb_size, mode=rtb.rb_strategy, beta=rtb.rb_beta, seed=rtb.seed)
            if rtb.replay_buffer
            else None
        )
        self.reward_on_device = reward_on_device
        self._host_rng = np.random.default_rng(rtb.seed + 7)
        self._last_x = None  # terminal samples stash for back-and-forth exploration
        self._fused_grad_jit = None
        self._bkw_grad_jit = None
        self._bf_grad_jit = None
        self._fwd_jit = jax.jit(
            self._forward, static_argnames=("batch_size", "sample_from_prior")
        )
        self._grad_jit = jax.jit(
            jax.value_and_grad(self._loss, has_aux=True),
            static_argnames=("batch_size", "n_peptides", "sample_from_prior"),
        )

    # ------------------------------------------------------------------
    def _forward(self, lora, key, condition, batch_size: int, sample_from_prior: bool = False):
        return self.sampler.sample_fwd(
            key, lora, condition, batch_size,
            detach_freq=self.rtb.detach_freq, detach_cut_off=self.rtb.detach_cut_off,
            sample_from_prior=sample_from_prior,
        )

    def _logz_estimate(self, trainables, logpf_posterior, log_pf_ref, logr,
                       peptide_ids=None, n_peptides: int = 1):
        """logZ for the RTB loss: the learned scalar, a VarGrad batch
        estimate, or — conditional multi-peptide variant — one VarGrad
        estimate PER PEPTIDE gathered back per element
        (src/rtb_utils/gfn_diffusion.py:438-456)."""
        if not self.rtb.vargrad:
            return trainables["logZ"]
        vg = vargrad_logz(logpf_posterior, log_pf_ref, logr)
        if peptide_ids is None or n_peptides <= 1:
            return jnp.mean(vg)
        sums = jax.ops.segment_sum(vg, peptide_ids, num_segments=n_peptides)
        counts = jax.ops.segment_sum(jnp.ones_like(vg), peptide_ids, num_segments=n_peptides)
        return (sums / jnp.maximum(counts, 1))[peptide_ids]

    def _loss(self, trainables, key, condition, logr, batch_size, peptide_ids=None,
              n_peptides: int = 1, sample_from_prior: bool = False):
        """Recomputes the trajectory under the same key so grads flow; returns RTB loss."""
        res = self.sampler.sample_fwd(
            key, trainables["lora"], condition, batch_size,
            detach_freq=self.rtb.detach_freq, detach_cut_off=self.rtb.detach_cut_off,
            sample_from_prior=sample_from_prior,
        )
        log_pf_ref = res["logpb"] if self.rtb.method == "tb" else res["logpf_prior"]
        logZ = self._logz_estimate(trainables, res["logpf_posterior"], log_pf_ref,
                                   logr, peptide_ids, n_peptides)
        loss = rtb_loss(res["logpf_posterior"], logZ, log_pf_ref, logr, self.rtb.learning_cutoff)
        aux = {
            "loss_vec": loss,
            "logZ": jnp.mean(logZ),
            "logZ_vec": logZ * jnp.ones_like(loss),
            "pf_divergence": jnp.mean(res["logpf_posterior"] - res["logpf_prior"]),
        }
        return jnp.mean(loss), aux

    @staticmethod
    def _replicate(tree, B: int):
        """Tile conditioning leaves to the sampler batch size (vargrad-aware
        replication, src/rtb_utils/priors.py:95-147)."""
        return jax.tree.map(
            lambda v: jnp.repeat(v, B // v.shape[0], axis=0) if v.shape[0] != B else v, tree
        )

    @staticmethod
    def _peptide_ids(batch: dict, B: int):
        """(ids (B,), n_peptides) matching ``_replicate``'s repeat layout: a
        dataset batch of n distinct peptides tiled to B gives B // n
        consecutive elements per peptide (the conditional variant's grouping,
        src/rtb_utils/gfn_diffusion.py:438-456)."""
        names = batch.get("name")
        n = len(names) if names is not None else 1
        if n <= 1:
            return None, 1
        uniq = {}
        base = np.asarray([uniq.setdefault(nm, len(uniq)) for nm in names])
        return jnp.asarray(np.repeat(base, B // n)), len(uniq)

    def _fused_loss(self, trainables, key, condition, batch_rep, seqres, batch_size,
                    peptide_ids=None, n_peptides: int = 1,
                    sample_from_prior: bool = False):
        """Single-pass variant for device-computable rewards: sampler + decode
        + reward + loss in one jit (the trajectory is sampled once, not
        re-run for the gradient). ``seqres`` is (B, L): each element is
        scored with its own sequence."""
        res = self.sampler.sample_fwd(
            key, trainables["lora"], condition, batch_size,
            detach_freq=self.rtb.detach_freq, detach_cut_off=self.rtb.detach_cut_off,
            sample_from_prior=sample_from_prior,
        )
        atom14, _ = self.prior_sim.engine._sample_with_zs0(
            self.prior_sim.engine.params, batch_rep, jax.lax.stop_gradient(res["x"])
        )
        logr = jax.lax.stop_gradient(jnp.asarray(self.reward_fn(atom14, seqres)))
        log_pf_ref = res["logpb"] if self.rtb.method == "tb" else res["logpf_prior"]
        logZ = self._logz_estimate(trainables, res["logpf_posterior"], log_pf_ref,
                                   logr, peptide_ids, n_peptides)
        loss = rtb_loss(res["logpf_posterior"], logZ, log_pf_ref, logr, self.rtb.learning_cutoff)
        aux = {
            "loss_vec": loss,
            "logZ": jnp.mean(logZ),
            "logZ_vec": logZ * jnp.ones_like(loss),
            "pf_divergence": jnp.mean(res["logpf_posterior"] - res["logpf_prior"]),
            "logr": logr,
            "x": res["x"],
        }
        return jnp.mean(loss), aux

    def _bkw_loss(self, trainables, key, condition, x0, logr):
        """Replay-buffer training objective: backward trajectories from stored
        terminal samples, RTB loss against the stored log-reward
        (src/rtb_utils/gfn_diffusion.py:406-412 + samplers.py sample_bkw)."""
        res = self.sampler.sample_bkw(
            key, trainables["lora"], condition, x0, detach_freq=self.rtb.detach_freq
        )
        log_pf_ref = res["logpb"] if self.rtb.method == "tb" else res["logpf_prior"]
        if self.rtb.vargrad:
            logZ = jnp.mean(vargrad_logz(res["logpf_posterior"], log_pf_ref, logr))
        else:
            logZ = trainables["logZ"]
        loss = rtb_loss(res["logpf_posterior"], logZ, log_pf_ref, logr, self.rtb.learning_cutoff)
        aux = {
            "loss_vec": loss,
            "logZ": jnp.mean(logZ),
            "pf_divergence": jnp.mean(res["logpf_posterior"] - res["logpf_prior"]),
        }
        return jnp.mean(loss), aux

    def _bf_loss(self, trainables, key, condition, batch_rep, seqres, x):
        """Back-and-forth exploration objective: renoise good terminal samples
        over part of the chain, resample forward, train on the local logZ-free
        RTB loss (reference flag src/rtb_utils/args.py:76; its sampler_step
        raises NotImplementedError — see samplers.back_and_forth_loss)."""
        from .samplers import back_and_forth_loss

        res = self.sampler.sample_back_and_forth(
            key, trainables["lora"], condition, x, noise_level=self.rtb.bf_noise_level
        )
        a14_x, _ = self.prior_sim.engine._sample_with_zs0(
            self.prior_sim.engine.params, batch_rep, jax.lax.stop_gradient(res["x"])
        )
        a14_xp, _ = self.prior_sim.engine._sample_with_zs0(
            self.prior_sim.engine.params, batch_rep, jax.lax.stop_gradient(res["x_prime"])
        )
        logr_x = jax.lax.stop_gradient(jnp.asarray(self.reward_fn(a14_x, seqres)))
        logr_xp = jax.lax.stop_gradient(jnp.asarray(self.reward_fn(a14_xp, seqres)))
        loss = back_and_forth_loss(res, logr_x, logr_xp, self.rtb.learning_cutoff)
        aux = {
            "loss_vec": loss,
            "logZ": trainables["logZ"] * jnp.ones(()),
            "pf_divergence": jnp.mean(res["logpf_posterior_f"] - res["logpf_prior_f"]),
            "logr": logr_xp,
            "x": res["x_prime"],
        }
        return jnp.mean(loss), aux

    # ------------------------------------------------------------------
    def step(self, it: int, key) -> dict:
        """One RTB iteration (src/rtb_utils/gfn_diffusion.py:391-491):
        regular forward RTB, with probabilistic replay-buffer draws
        (gfn_diffusion.py:406-408), optional prior-sampling stabilization
        (args.py:83-84), and periodic back-and-forth exploration."""
        k_sample, k_grad = jax.random.split(jax.random.fold_in(key, it))
        condition, batch = self.prior_sim.get_cond_args()
        B = self.rtb.batch_size
        condition = self._replicate(condition, B)
        batch_rep = self._replicate({k: v for k, v in batch.items() if k != "name"}, B)
        peptide_ids, n_peptides = self._peptide_ids(batch, B)
        trainables = {"lora": self.lora, "logZ": self.logZ}

        # ---- replay-buffer training draw (reference: it > batch_size gate) ----
        use_replay = (
            self.replay is not None
            and it > self.rtb.batch_size
            and len(self.replay) >= B
            and self._host_rng.random() < self.rtb.rb_ratio
        )
        if use_replay:
            x0, logr = self.replay.sample(B)
            if self._bkw_grad_jit is None:
                self._bkw_grad_jit = jax.jit(jax.value_and_grad(self._bkw_loss, has_aux=True))
            (loss, aux), grads = self._bkw_grad_jit(
                trainables, k_sample, condition, jnp.asarray(x0), jnp.asarray(logr)
            )
            return self._apply_update(trainables, grads, aux, loss, jnp.asarray(logr), None)

        # ---- back-and-forth exploration step ----
        if (
            self.rtb.back_and_forth
            and self._last_x is not None
            and it % self.rtb.bf_freq == self.rtb.bf_freq - 1
        ):
            if self._bf_grad_jit is None:
                self._bf_grad_jit = jax.jit(jax.value_and_grad(self._bf_loss, has_aux=True))
            (loss, aux), grads = self._bf_grad_jit(
                trainables, k_sample, condition, batch_rep, batch_rep["seqres"], self._last_x
            )
            self._last_x = jax.lax.stop_gradient(aux["x"])
            return self._apply_update(trainables, grads, aux, loss, aux["logr"], None)

        sample_from_prior = bool(
            self.rtb.prior_sampling and self._host_rng.random() < self.rtb.prior_sampling_ratio
        )

        if self.reward_on_device:
            if self._fused_grad_jit is None:
                self._fused_grad_jit = jax.jit(
                    jax.value_and_grad(self._fused_loss, has_aux=True),
                    static_argnames=("batch_size", "n_peptides", "sample_from_prior"),
                )
            (loss, aux), grads = self._fused_grad_jit(
                trainables, k_sample, condition, batch_rep, batch_rep["seqres"],
                batch_size=B, peptide_ids=peptide_ids, n_peptides=n_peptides,
                sample_from_prior=sample_from_prior,
            )
            logr, zs0 = aux["logr"], aux["x"]
        else:
            # host reward (OpenMM): sample -> decode -> reward -> re-run with grads
            res = self._fwd_jit(
                self.lora, k_sample, condition, batch_size=B, sample_from_prior=sample_from_prior
            )
            zs0 = res["x"]
            atom14, _ = self.prior_sim.sample(batch_rep, zs0)
            logr = jnp.asarray(self.reward_fn(atom14, batch_rep["seqres"]))
            (loss, aux), grads = self._grad_jit(
                trainables, k_sample, condition, logr, B, peptide_ids=peptide_ids,
                n_peptides=n_peptides, sample_from_prior=sample_from_prior,
            )
        return self._apply_update(trainables, grads, aux, loss, logr, zs0)

    def _apply_update(self, trainables, grads, aux, loss, logr, zs0) -> dict:
        updates, self.opt_state = self.opt.update(grads, self.opt_state, trainables)
        new_trainables = optax.apply_updates(trainables, updates)
        self.lora, self.logZ = new_trainables["lora"], new_trainables["logZ"]
        if self.rtb.vargrad:
            self.logZ = aux["logZ"]

        if zs0 is not None:
            self._last_x = zs0
            if self.replay is not None:
                # only fresh samples enter the buffer (x_0 is None in the
                # reference, gfn_diffusion.py:463-465)
                self.replay.add(np.asarray(zs0), np.asarray(logr), np.asarray(aux["loss_vec"]))

        return {
            "loss": float(loss),
            "logr": float(jnp.mean(logr)),
            "logZ": float(aux["logZ"]),
            "pf_divergence": float(aux["pf_divergence"]),
        }

    def run(self, n_iterations: Optional[int] = None, log_every: int = 10, log_fn=None) -> list:
        os.makedirs(self.workdir, exist_ok=True)
        key = jax.random.key(self.rtb.seed + 1)
        history = []
        for it in range(n_iterations or self.rtb.n_iterations):
            t0 = time.time()
            metrics = self.step(it, key)
            metrics.update(it=it, dur=round(time.time() - t0, 2))
            history.append(metrics)
            if it % log_every == 0:
                (log_fn or (lambda m: print(json.dumps(m), flush=True)))(metrics)
        return history

    # ------------------------------------------------------------------
    def save(self, path: Optional[str] = None):
        import pickle

        path = path or os.path.join(self.workdir, "checkpoint.pkl")
        with open(path, "wb") as f:
            pickle.dump(
                {"lora": jax.device_get(self.lora), "logZ": float(self.logZ),
                 "opt_state": jax.device_get(self.opt_state)},
                f,
            )
        return path

    def load(self, path: str):
        import pickle

        with open(path, "rb") as f:
            ckpt = pickle.load(f)
        self.lora = jax.device_put(ckpt["lora"])
        self.logZ = jnp.asarray(ckpt["logZ"])
        self.opt_state = jax.device_put(ckpt["opt_state"])


class RTBBatchedTrainer(RTBTrainer):
    """Memory-bounded RTB: one no-grad trajectory, then gradient accumulation
    over timestep minibatches replaying stored transitions with target-forced
    noise (src/rtb_utils/gfn_diffusion.py:494-543, src/models/samplers.py:686-742).

    Use when sampling_length is too long for the full-trajectory graph; the
    regular trainer is faster at short chains.
    """

    def __init__(self, *args, replay_chunk: int = 4, **kw):
        super().__init__(*args, **kw)
        self.replay_chunk = replay_chunk
        self._replay_grad_jit = None
        self._traj_jit = None

    def step(self, it: int, key) -> dict:
        k_sample, _ = jax.random.split(jax.random.fold_in(key, it))
        condition, batch = self.prior_sim.get_cond_args()
        B = self.rtb.batch_size
        condition = self._replicate(condition, B)
        batch_rep = self._replicate({k: v for k, v in batch.items() if k != "name"}, B)

        if not hasattr(self, "_traj_jit") or self._traj_jit is None:
            self._traj_jit = jax.jit(
                lambda lora, k, cond: self.sampler.sample_fwd(
                    k, lora, cond, B, detach_freq=self.rtb.detach_freq, save_traj=True
                )
            )
        res = self._traj_jit(self.lora, k_sample, condition)
        atom14, _ = self.prior_sim.sample(batch_rep, res["x"])
        logr = jnp.asarray(self.reward_fn(atom14, batch_rep["seqres"]))

        log_pf_ref = res["logpb"] if self.rtb.method == "tb" else res["logpf_prior"]
        correction = jax.lax.stop_gradient(
            res["logpf_posterior"] + self.logZ - log_pf_ref - logr
        )  # dLoss/dlogpf per sample (up to the relu cutoff, applied below)
        active = (correction**2 > self.rtb.learning_cutoff).astype(correction.dtype)
        correction = correction * active

        sched = self.sampler.scheduler
        # transition i: traj[i] -> traj[i+1], stepped at next_timestep(timesteps[i])
        step_ts = np.asarray([int(sched.next_timestep(jnp.asarray(int(t)))) for t in sched.timesteps])
        traj = res["traj"]
        n_steps = len(step_ts)

        if self._replay_grad_jit is None:

            def chunk_obj(trainables, xs, ts, targets, correction, condition):
                lp = self.sampler.replay_logpf(trainables["lora"], condition, xs, ts, targets)
                corr = jnp.tile(correction, xs.shape[0])
                return jnp.mean((lp + trainables["logZ"]) * corr)

            self._replay_grad_jit = jax.jit(jax.grad(chunk_obj))

        trainables = {"lora": self.lora, "logZ": self.logZ}
        grads = jax.tree.map(jnp.zeros_like, trainables)
        m = self.replay_chunk
        for s in range(0, n_steps, m):
            idx = list(range(s, min(s + m, n_steps)))
            if len(idx) < m:  # pad the last chunk by repeating its first step
                idx = idx + [idx[-1]] * (m - len(idx))
            xs = jnp.stack([traj[i] for i in idx])
            targets = jnp.stack([traj[i + 1] for i in idx])
            ts = jnp.asarray(step_ts[idx])
            g = self._replay_grad_jit(trainables, xs, ts, targets, correction, condition)
            grads = jax.tree.map(jnp.add, grads, g)

        updates, self.opt_state = self.opt.update(grads, self.opt_state, trainables)
        new_t = optax.apply_updates(trainables, updates)
        self.lora, self.logZ = new_t["lora"], new_t["logZ"]

        loss = 0.5 * jnp.mean(jax.nn.relu(correction**2 - self.rtb.learning_cutoff))
        return {
            "loss": float(loss),
            "logr": float(jnp.mean(logr)),
            "logZ": float(self.logZ),
            "pf_divergence": float(jnp.mean(res["logpf_posterior"] - res["logpf_prior"])),
        }


# ---------------------------------------------------------------------------
class DiffuserTrainer:
    """Outsourced-prior distillation (src/rtb_utils/gfn_diffusion.py:605-805):
    train a DDPM v-predictor to reproduce the MDGen prior-latent distribution."""

    def __init__(
        self,
        cfg: MDGenConfig,
        source_sampler: Callable,  # key -> clean latents (B, T, L, D)
        condition: dict,
        lr: float = 1e-4,
        num_train_timesteps: int = 1000,
        min_snr_gamma: float = 5.0,
        seed: int = 0,
        model: Optional[object] = None,
    ):
        self.cfg = cfg
        self.model = model if model is not None else LatentMDGen(
            cfg, cfg.latent_dim,
            dtype=jnp.bfloat16 if cfg.model.use_bf16 else jnp.float32)
        self.scheduler = DDPMGFNScheduler(num_train_timesteps=num_train_timesteps)
        self.source_sampler = source_sampler
        self.condition = condition
        self.min_snr_gamma = min_snr_gamma
        self.num_train_timesteps = num_train_timesteps
        self.tx = optax.adamw(lr)
        self.seed = seed
        self._step_jit = None

    def init_params(self, key, sample_clean):
        B = sample_clean.shape[0]
        return self.model.init(key, sample_clean, jnp.zeros((B,)), **self.condition)

    def _loss(self, params, key, clean):
        B = clean.shape[0]
        k_t, k_n = jax.random.split(key)
        t = jax.random.randint(k_t, (B,), 0, self.num_train_timesteps)
        noise = jax.random.normal(k_n, clean.shape)
        noisy = self.scheduler.add_noise(clean, noise, t)
        target = self.scheduler.get_velocity(clean, noise, t)
        pred = self.model.apply(params, noisy, t.astype(jnp.float32) / self.num_train_timesteps, **self.condition)
        # min-SNR-gamma weighting (gfn_diffusion.py:732-744)
        a = self.scheduler._alpha_prod(t)
        snr = a / (1 - a)
        w = jnp.minimum(snr, self.min_snr_gamma) / jnp.clip(snr, 1e-8)
        mse = jnp.mean((pred - target) ** 2, axis=tuple(range(1, clean.ndim)))
        return jnp.mean(w * mse)

    def train(self, params, opt_state, n_steps: int, key) -> tuple:
        if self._step_jit is None:

            @jax.jit
            def step(params, opt_state, key):
                k_data, k_loss = jax.random.split(key)
                clean = self.source_sampler(k_data)
                loss, grads = jax.value_and_grad(self._loss)(params, k_loss, clean)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

            self._step_jit = step
        losses = []
        for i in range(n_steps):
            key, k = jax.random.split(key)
            params, opt_state, loss = self._step_jit(params, opt_state, k)
            losses.append(float(loss))
        return params, opt_state, losses
