"""Train-step throughput at the bench config (forward + backward + optax).

Measures the full jitted Trainer step (loss, grads, EMA, donated state) at the
4AA crop-4 / T=100 / B=32 flagship shape — the number VERDICT r2 item 4 asks
for alongside the forward bench. Run solo on the TPU.
"""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from mdgen_finetune_tpu.config import (DataConfig, MDGenConfig, ModelConfig,
                                       TaskConfig, TrainConfig)
from mdgen_finetune_tpu.data.synthetic import make_synthetic_dataset
from mdgen_finetune_tpu.data import MDGenDataset, make_batch_iterator
from mdgen_finetune_tpu.training import Trainer


def main(B=32, T=100, L=4, steps=24, grad_ckpt=False):
    if L == 4:
        peps = ["AAGG", "GHKL"]
    else:
        # ATLAS-style long chains: random L-residue sequences
        rng0 = np.random.default_rng(7)
        alpha = "ACDEFGHIKLMNPQRSTVWY"
        peps = [(f"chain{j}", "".join(alpha[i] for i in rng0.integers(0, 20, size=L)))
                for j in range(2)]
    split = make_synthetic_dataset("/tmp/tsb/data", peps, num_frames=T + 8)
    cfg = MDGenConfig(
        model=ModelConfig(prepend_ipa=True, abs_pos_emb=True, use_bf16=True,
                          grad_checkpointing=grad_ckpt),
        data=DataConfig(data_dir="/tmp/tsb/data", num_frames=T, crop=L),
        task=TaskConfig(sim_condition=True),
        train=TrainConfig(batch_size=B, lr=1e-4, ema=True),
    )
    trainer = Trainer(cfg)
    ds = MDGenDataset(cfg, split)
    it = make_batch_iterator(ds, B, seed=0)
    state = trainer.init_state(jax.random.key(0), next(it))

    print("init done, compiling step...", flush=True)
    raw_step = trainer.train_step

    def step_fn(state, b, key):
        return raw_step(state, {k: v for k, v in b.items() if k != "name"}, key)
    t0 = time.perf_counter()
    state, metrics = step_fn(state, next(it), jax.random.key(1))
    jax.block_until_ready(metrics)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s", flush=True)

    # pre-upload every batch and sync BEFORE timing: host->device uploads
    # through the execution relay are lazy and serialize the step loop
    # otherwise (~20 ms/step of tunnel RTT measured r4 — the r3 35.5 ms
    # number carried it); production training overlaps uploads via the
    # prefetching loader, so the step cost is the honest metric
    batches = [jax.device_put({k: jnp.asarray(v) for k, v in next(it).items()
                               if k != "name"}) for _ in range(steps)]
    jax.block_until_ready(batches)
    start = time.perf_counter()
    ms = []
    for i, b in enumerate(batches):
        state, metrics = step_fn(state, b, jax.random.key(2 + i))
        ms.append(metrics)
    jax.block_until_ready((state, ms))
    elapsed = time.perf_counter() - start
    per_step = elapsed / steps
    print(f"B={B} T={T} L={L} grad_ckpt={grad_ckpt}: "
          f"{1000 * per_step:.2f} ms/train-step, "
          f"{B / per_step:.1f} traj-steps/sec/chip", flush=True)


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = (v == "True") if v in ("True", "False") else int(v)
    main(**kw)
