"""Training CLI, flag-compatible with the reference's train.py.

Usage (same commands as reference README.md:50-65, module path swapped):
    python -m mdgen_finetune_tpu.cli.train --sim_condition --train_split ... \
        --data_dir ... --num_frames 1000 --prepend_ipa --abs_pos_emb --crop 4 ...
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from ..data import MDGenDataset, make_batch_iterator
from ..training import Trainer
from .args import add_train_args, args_to_config


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_train_args(parser)
    parser.add_argument("--steps_per_epoch", type=int, default=None)
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler trace of the first epoch's steps here")
    a = parser.parse_args(argv)
    cfg = args_to_config(a)

    workdir = os.path.join(cfg.workdir, cfg.run_name)
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "config.json"), "w") as f:
        f.write(cfg.to_json())

    trainer = Trainer(cfg)
    train_ds = MDGenDataset(cfg, cfg.data.train_split)
    val_ds = MDGenDataset(cfg, cfg.data.val_split, repeat=a.val_repeat)
    it = make_batch_iterator(train_ds, cfg.train.batch_size, seed=cfg.train.seed)

    state = trainer.init_state(jax.random.key(cfg.train.seed), next(it))
    if a.ckpt:
        state = trainer.restore_checkpoint(a.ckpt, state)
        print(f"resumed from {a.ckpt} at step {int(state.step)}")

    # --train_batches caps the epoch length (Lightning limit_train_batches,
    # reference train.py:49); --steps_per_epoch is our explicit override
    steps_per_epoch = a.steps_per_epoch or a.train_batches or max(len(train_ds) // cfg.train.batch_size, 1)
    log_path = os.path.join(workdir, "log.jsonl")
    rng = jax.random.key(cfg.train.seed + 1)

    def log_fn(m):
        print(json.dumps(m), flush=True)
        with open(log_path, "a") as f:
            f.write(json.dumps(m) + "\n")

    val_step = jax.jit(lambda params, batch, key: trainer._loss_fn(params, key, batch)[1])

    from ..utils.logging import profile_trace

    for epoch in range(cfg.train.epochs):
        rng, sub = jax.random.split(rng)
        with profile_trace(a.profile_dir if epoch == 0 else None):
            state = trainer.fit(state, it, steps_per_epoch, sub, log_every=cfg.train.print_freq, log_fn=log_fn)

        if cfg.task.design and a.inference_batches and (epoch + 1) % a.designability_freq == 0:
            # designability probe: sample and measure sequence recovery
            # (src/mdgen/wrapper.py:516-537)
            from ..analysis import sequence_recovery
            from ..data.featurize import featurize_atom14_batch
            from ..inference import InferenceEngine

            engine = InferenceEngine(cfg, state.ema_params if cfg.train.ema else state.params)
            vb = val_ds.batch(np.random.default_rng(epoch), min(cfg.train.batch_size, 2))
            feats = featurize_atom14_batch(vb["atom14"], vb["seqres"], vb["mask"])
            rng, key = jax.random.split(rng)
            _, aa_out = engine.sample(feats, key)
            # val batches mix peptides: score each element against its OWN
            # ground truth, then average (not everything vs seqres[0])
            aa = np.asarray(aa_out)[:, 0]
            seqs = np.asarray(vb["seqres"])
            recs = [sequence_recovery(aa[i : i + 1], seqs[i]) for i in range(aa.shape[0])]
            rec = {k: float(np.mean([r[k] for r in recs])) for k in recs[0]}
            log_fn({f"designability_{k}": v for k, v in rec.items()} | {"epoch": epoch})

        if not a.no_validate and (epoch + 1) % a.val_epoch_freq == 0:
            vrng = np.random.default_rng(0)
            vmetrics = []
            for _ in range(a.val_batches or max(len(val_ds) // cfg.train.batch_size, 1)):
                batch = val_ds.batch(vrng, cfg.train.batch_size)
                from ..parallel.mesh import shard_batch

                rng, key = jax.random.split(rng)
                params = state.ema_params if cfg.train.ema else state.params
                vmetrics.append(val_step(params, shard_batch(trainer.mesh, batch), key))
            mean = {f"val_{k}": float(np.mean([float(m[k]) for m in vmetrics])) for k in vmetrics[0]}
            mean.update(epoch=epoch, step=int(state.step))
            log_fn(mean)

        if (epoch + 1) % cfg.train.ckpt_freq == 0 or epoch == cfg.train.epochs - 1:
            path = trainer.save_checkpoint(state)
            print(f"saved {path}", flush=True)


if __name__ == "__main__":
    main()
