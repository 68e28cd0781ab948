"""Outsourced-prior distillation CLI (reference src/train_prior.py).

Distills the frozen MDGen prior-latent distribution (uniform [-3,3] draws,
src/train_prior.py:52-59) into a DDPM v-predictor so the RTB chain has exact
per-step log-probabilities.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle

import jax
import numpy as np

from ..inference import sample_prior_latent
from ..rtb.priors import MDGenSimulator
from ..rtb.trainer import DiffuserTrainer
from .sim_inference import load_params


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sim_ckpt", type=str, default=None)
    p.add_argument("--torch_ckpt", type=str, default=None)
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--split", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--n_steps", type=int, default=10000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--traj_length", type=int, default=1000)
    p.add_argument("--exp_name", type=str, default="prior_distill")
    p.add_argument("--workdir", type=str, default="workdir")
    p.add_argument("--print_freq", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)

    cfg, params = load_params(a)
    sim = MDGenSimulator(cfg, params, a.split, data_dir=a.data_dir, batch_size=a.batch_size)
    condition, _ = sim.get_cond_args()
    T, L, D = sim.latent_shape

    def source(key):
        return sample_prior_latent(key, a.batch_size, T, L, D, uniform=True)

    dt = DiffuserTrainer(cfg, source, condition, lr=a.lr, num_train_timesteps=a.traj_length, seed=a.seed)
    key = jax.random.key(a.seed)
    prior_params = dt.init_params(key, source(key))
    opt_state = dt.tx.init(prior_params)

    workdir = os.path.join(a.workdir, a.exp_name)
    os.makedirs(workdir, exist_ok=True)
    done = 0
    while done < a.n_steps:
        chunk = min(a.print_freq, a.n_steps - done)
        key, k = jax.random.split(key)
        prior_params, opt_state, losses = dt.train(prior_params, opt_state, chunk, k)
        done += chunk
        print(json.dumps({"step": done, "loss": float(np.mean(losses))}), flush=True)
        with open(os.path.join(workdir, "prior_params.pkl"), "wb") as f:
            pickle.dump(jax.device_get(prior_params), f)


if __name__ == "__main__":
    main()
