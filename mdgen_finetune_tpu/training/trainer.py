"""pjit-sharded training runtime: one donated train step, optax, EMA, orbax.

Replaces the reference's PyTorch-Lightning wrapper + trainer
(src/mdgen/wrapper.py:46-172, src/train.py:44-77). The whole step — on-device
featurization, task prep, flow-matching loss, backward, global-norm clip,
Adam/AdamW update, EMA — is a single jitted function with donated state,
sharded over the (dp, sp) mesh. Metrics come back as scalars; logging is
host-side CSV + stdout (wandb-gated).
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Iterator, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import MDGenConfig
from ..data.featurize import featurize_atom14_batch
from ..models import LatentMDGen
from ..parallel.kernel_sharding import set_kernel_mesh
from ..parallel.mesh import make_mesh, replicated_sharding, shard_batch
from ..tasks import prep_batch
from ..transport import create_transport


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any  # = params when EMA disabled


def make_optimizer(cfg: MDGenConfig) -> optax.GradientTransformation:
    opt = optax.adamw(cfg.train.lr) if cfg.train.adamW else optax.adam(cfg.train.lr)
    tx = optax.chain(optax.clip_by_global_norm(cfg.train.grad_clip), opt)
    if cfg.train.accumulate_grad > 1:
        tx = optax.MultiSteps(tx, cfg.train.accumulate_grad)
    return tx


class Trainer:
    def __init__(self, cfg: MDGenConfig, mesh=None, dtype=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.train.dp_size or None, cfg.train.sp_size)
        # let the Pallas kernel dispatchers shard_map over this mesh when the
        # step traces under multiple devices (parallel/kernel_sharding.py)
        set_kernel_mesh(self.mesh)
        self.dtype = dtype if dtype is not None else (jnp.bfloat16 if cfg.model.use_bf16 else jnp.float32)
        self.model = LatentMDGen(cfg, cfg.latent_dim, dtype=self.dtype)
        # dropout-active twin for the training loss (same params; train=True
        # switches on attention-prob dropout, reference mha.py:383, ipa.py:204)
        self.model_train = (
            LatentMDGen(cfg, cfg.latent_dim, dtype=self.dtype, train=True)
            if cfg.model.dropout > 0.0 else self.model
        )
        self.transport = create_transport(cfg)
        self.tx = make_optimizer(cfg)
        self._train_step = None
        self.workdir = os.path.join(cfg.workdir, cfg.run_name)

    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array, sample_batch: dict) -> TrainState:
        feats = self._featurize(
            {k: jnp.asarray(v) for k, v in sample_batch.items() if k != "name"}
        )
        prep = prep_batch(self.cfg, feats)
        kw = prep["model_kwargs"]
        B = prep["latents"].shape[0]
        x = jnp.concatenate(
            [prep["latents"], jnp.zeros((*prep["latents"].shape[:-1], 20))], -1
        ) if self.cfg.task.design else prep["latents"]
        # jit the flax init: eager init dispatches hundreds of tiny ops
        # through the execution relay (~0.5-1 s each on a slow relay day —
        # minutes-to-hours at flagship width); one jitted call compiles in
        # ~30 s and runs in ms (CLAUDE.md environment gotcha)
        params = jax.jit(self.model.init)(
            rng, x, jnp.zeros((B,)), kw["mask"],
            start_frames=kw.get("start_frames"), end_frames=kw.get("end_frames"),
            x_cond=kw["x_cond"], x_cond_mask=kw["x_cond_mask"], aatype=kw["aatype"],
        )
        opt_state = self.tx.init(params)
        # ema must be distinct buffers: the train step donates the whole state
        ema = jax.tree.map(lambda x: x.copy(), params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state, ema_params=ema)
        return jax.device_put(state, replicated_sharding(self.mesh))

    # ------------------------------------------------------------------
    def _featurize(self, batch):
        if self.cfg.task.no_frames:
            # raw-coordinate ablation: atom37 + per-atom mask (src/mdgen/dataset.py:81-88)
            from ..geometry import frames as G
            from ..geometry import tables as rc

            B, T, L = batch["atom14"].shape[:3]
            aat = jnp.broadcast_to(batch["seqres"][:, None], (B, T, L))
            atom37 = G.atom14_to_atom37(batch["atom14"].astype(jnp.float32), aat)
            return {
                "atom37": atom37,
                "seqres": batch["seqres"],
                "mask": jnp.asarray(rc.RESTYPE_ATOM37_MASK)[batch["seqres"]],
            }
        return featurize_atom14_batch(batch["atom14"], batch["seqres"], batch["mask"])

    def _loss_fn(self, params, key, batch):
        feats = self._featurize(batch)
        prep = prep_batch(self.cfg, feats)
        kw = prep["model_kwargs"]

        rngs = None
        if self.cfg.model.dropout > 0.0:
            key, k_drop = jax.random.split(key)
            rngs = {"dropout": k_drop}

        def model_fn(x, t, **kwargs):
            return self.model_train.apply(params, x, t, rngs=rngs, **kwargs)

        terms = self.transport.training_losses(
            model_fn,
            key,
            prep["latents"],
            aatype1=batch["seqres"] if self.cfg.task.design else None,
            mask=prep["loss_mask"],
            model_kwargs=kw,
        )
        loss = jnp.mean(terms["loss"])
        metrics = {"loss": loss, "t_mean": jnp.mean(terms["t"])}
        if self.cfg.task.design:
            metrics["loss_discrete"] = jnp.mean(terms["loss_discrete"])
            metrics["loss_continuous"] = jnp.mean(terms["loss_continuous"])
        return loss, metrics

    def _step(self, state: TrainState, batch: dict, key) -> tuple:
        (_, metrics), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(state.params, key, batch)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        decay = self.cfg.train.ema_decay if self.cfg.train.ema else 0.0
        ema = jax.tree.map(lambda e, p: decay * e + (1 - decay) * p, state.ema_params, params)
        return TrainState(step=state.step + 1, params=params, opt_state=opt_state, ema_params=ema), metrics

    def check_grad_coverage(self, state: TrainState, batch: dict, key) -> list:
        """Return param paths receiving all-zero gradients (reference
        --check_grad, src/mdgen/wrapper.py:115-118)."""
        import flax.traverse_util as traverse

        _, grads = jax.value_and_grad(self._loss_fn, has_aux=True)(state.params, key, batch)
        flat = traverse.flatten_dict(jax.device_get(grads), sep="/")
        return [k for k, v in flat.items() if float(jnp.abs(v).max()) == 0.0]

    @property
    def train_step(self):
        if self._train_step is None:
            self._train_step = jax.jit(self._step, donate_argnums=(0,))
        return self._train_step

    # ------------------------------------------------------------------
    def fit(
        self,
        state: TrainState,
        batches: Iterator[dict],
        num_steps: int,
        rng: jax.Array,
        log_every: int = 50,
        log_fn=None,
    ) -> TrainState:
        step_fn = self.train_step
        history = []
        t_last = time.time()
        for i in range(num_steps):
            batch = next(batches)
            rng, key = jax.random.split(rng)
            device_batch = shard_batch(self.mesh, batch)
            state, metrics = step_fn(state, device_batch, key)
            if (i + 1) % log_every == 0 or i == num_steps - 1:
                if jax.process_count() > 1:
                    # multi-host: average scalars across processes
                    # (replaces the reference's all_gather_object of log dicts,
                    # src/mdgen/wrapper.py:22-28)
                    from jax.experimental import multihost_utils

                    metrics = multihost_utils.process_allgather(metrics)
                    metrics = {k: float(np.mean(v)) for k, v in metrics.items()}
                metrics = {k: float(v) for k, v in metrics.items()}
                metrics.update(step=int(state.step), dur=time.time() - t_last)
                t_last = time.time()
                history.append(metrics)
                (log_fn or (lambda m: print(json.dumps(m), flush=True)))(metrics)
        return state

    # ------------------------------------------------------------------
    def save_checkpoint(self, state: TrainState, path: Optional[str] = None):
        import orbax.checkpoint as ocp

        path = path or os.path.join(self.workdir, f"ckpt_{int(state.step)}")
        path = os.path.abspath(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(state))
        ckptr.wait_until_finished()
        with open(os.path.join(path, "config.json"), "w") as f:
            f.write(self.cfg.to_json())
        return path

    def restore_checkpoint(self, path: str, template: TrainState) -> TrainState:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(path), target=jax.device_get(template))
        return jax.device_put(restored, replicated_sharding(self.mesh))
