"""Forward-simulation rollout CLI (reference src/sim_inference.py).

Loads a checkpoint (orbax dir from our trainer, or a reference .ckpt via
--torch_ckpt), rolls out num_rollouts windows per test peptide, writes
multi-MODEL PDB trajectories.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from ..config import MDGenConfig
from ..data import MDGenDataset
from ..geometry.protein import atom14_to_pdb
from ..inference import InferenceEngine
from ..training import Trainer


def load_params(args) -> tuple:
    if args.torch_ckpt:
        from ..utils.torch_compat import load_reference_checkpoint

        params, ema, hparams = load_reference_checkpoint(args.torch_ckpt)
        cfg_path = args.config or os.path.join(os.path.dirname(args.torch_ckpt), "config.json")
        cfg = MDGenConfig.from_json(open(cfg_path).read())
        return cfg, (ema or params)
    cfg = MDGenConfig.from_json(open(os.path.join(args.sim_ckpt, "config.json")).read())
    trainer = Trainer(cfg)
    ds = None  # template init below uses synthetic batch shapes from cfg
    from ..data.synthetic import synthesize_trajectory

    B, T, L = 1, cfg.data.num_frames, cfg.data.crop
    atom14 = synthesize_trajectory("A" * L, T).astype(np.float32)[None]
    batch = {"atom14": atom14, "seqres": np.zeros((B, L), np.int32), "mask": np.ones((B, L), np.float32)}
    template = trainer.init_state(jax.random.key(0), batch)
    state = trainer.restore_checkpoint(args.sim_ckpt, template)
    return cfg, (state.ema_params if cfg.train.ema else state.params)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sim_ckpt", type=str, default=None)
    p.add_argument("--torch_ckpt", type=str, default=None)
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--split", type=str, required=True)
    p.add_argument("--suffix", type=str, default="")
    p.add_argument("--num_frames", type=int, default=None)
    p.add_argument("--num_rollouts", type=int, default=10)
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--seed", type=int, default=137)
    p.add_argument("--all_peptides", action="store_true",
                   help="process every split row (the reference stops after the first, src/sim_inference.py:136)")
    # reverse-SDE sampling (reference Sampler.sample_sde, transport.py:346-450)
    p.add_argument("--sde", action="store_true", help="sample with the reverse SDE instead of the pf-ODE")
    p.add_argument("--sde_steps", type=int, default=250)
    p.add_argument("--sde_method", type=str, default="Euler", choices=["Euler", "Heun"])
    p.add_argument("--diffusion_form", type=str, default="SBDM")
    p.add_argument("--diffusion_norm", type=float, default=1.0)
    p.add_argument("--last_step", type=str, default="Mean", choices=["Mean", "Tweedie", "Euler"])
    p.add_argument("--last_step_size", type=float, default=0.04)
    a = p.parse_args(argv)

    cfg, params = load_params(a)
    if a.num_frames:
        import dataclasses

        cfg = cfg.replace(data=dataclasses.replace(cfg.data, num_frames=a.num_frames, data_dir=a.data_dir, suffix=a.suffix))
    sde_opts = dict(
        num_steps=a.sde_steps, method=a.sde_method, diffusion_form=a.diffusion_form,
        diffusion_norm=a.diffusion_norm, last_step=a.last_step, last_step_size=a.last_step_size,
    )
    engine = InferenceEngine(cfg, params, sampler="sde" if a.sde else "ode", sde_opts=sde_opts if a.sde else None)
    ds = MDGenDataset(cfg, a.split, data_dir=a.data_dir)
    os.makedirs(a.out_dir, exist_ok=True)

    key = jax.random.key(a.seed)
    for idx, (name, seq) in enumerate(ds.entries):
        sample = ds.sample(np.random.default_rng(a.seed), idx=idx)
        start = sample["atom14"][:1][None]  # (1, 1, L, 14, 3) -> frame 0
        t0 = time.time()
        key, k = jax.random.split(key)
        traj = engine.rollout(start[:, 0], sample["seqres"][None], sample["mask"][None], a.num_rollouts, k)
        dur = time.time() - t0
        out_path = os.path.join(a.out_dir, f"{name}.pdb")
        atom14_to_pdb(traj[0], sample["seqres"], out_path)
        meta = {"name": name, "frames": int(traj.shape[1]), "wall_s": round(dur, 2),
                "frames_per_sec": round(traj.shape[1] / dur, 2)}
        print(json.dumps(meta), flush=True)
        with open(os.path.join(a.out_dir, f"{name}_meta.json"), "w") as f:
            json.dump(meta, f)
        if not a.all_peptides:
            break  # reference behavior: first peptide only (src/sim_inference.py:136)


if __name__ == "__main__":
    main()
