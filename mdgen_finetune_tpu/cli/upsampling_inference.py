"""Trajectory upsampling CLI (reference src/upsampling_inference.py).

Slices a coarse (implicit-solvent) trajectory into windows, conditions on
every cond_interval-th frame (zeros elsewhere, identity rotations), and
generates the fine-grained in-between frames; outputs are stitched back into
one long trajectory PDB.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import frames as G
from ..geometry.protein import atom14_to_pdb
from ..geometry.tables import str_sequence_to_aatype
from ..inference import InferenceEngine
from .sim_inference import load_params


def split_windows(item: dict, num_frames: int, cond_interval: int) -> list[dict]:
    """(src/upsampling_inference.py:47-66): each window holds coarse frames at
    ::cond_interval, zeros (identity rots) elsewhere."""
    T_c, L = item["trans"].shape[:2]
    cond_frames = num_frames // cond_interval
    total_items = T_c // cond_frames
    out = []
    for i in range(total_items):
        sel = slice(i * cond_frames, (i + 1) * cond_frames)
        torsions = np.zeros((num_frames, L, 7, 2), np.float32)
        trans = np.zeros((num_frames, L, 3), np.float32)
        rots = np.broadcast_to(np.eye(3, dtype=np.float32), (num_frames, L, 3, 3)).copy()
        torsions[::cond_interval] = item["torsions"][sel]
        trans[::cond_interval] = item["trans"][sel]
        rots[::cond_interval] = item["rots"][sel]
        out.append(
            {"torsions": torsions[None], "torsion_mask": item["torsion_mask"][None],
             "trans": trans[None], "rots": rots[None],
             "seqres": item["seqres"][None], "mask": item["mask"][None]}
        )
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", dest="sim_ckpt", type=str, default=None)
    p.add_argument("--torch_ckpt", type=str, default=None)
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--suffix", type=str, default="_i100")
    p.add_argument("--split", type=str, required=True)
    p.add_argument("--pdb_id", nargs="*", default=[])
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--seed", type=int, default=137)
    a = p.parse_args(argv)

    cfg, params = load_params(a)
    engine = InferenceEngine(cfg, params)
    os.makedirs(a.out_dir, exist_ok=True)
    cond_interval = cfg.task.cond_interval or 100

    import csv

    with open(a.split) as f:
        rows = list(csv.DictReader(f))
    key = jax.random.key(a.seed)

    for row in rows:
        name, seqres = row["name"], row["seqres"]
        if a.pdb_id and name not in a.pdb_id:
            continue
        aatype = str_sequence_to_aatype(seqres)
        arr = np.load(os.path.join(a.data_dir, f"{name}{a.suffix}.npy")).astype(np.float32)
        T_c, L = arr.shape[:2]
        frames = G.atom14_to_frames(jnp.asarray(arr))
        atom37 = G.atom14_to_atom37(jnp.asarray(arr), jnp.broadcast_to(jnp.asarray(aatype), (T_c, L)))
        torsions, torsion_mask = G.atom37_to_torsions(atom37, jnp.broadcast_to(jnp.asarray(aatype), (T_c, L)))
        item = {
            "torsions": np.asarray(torsions), "torsion_mask": np.asarray(torsion_mask)[0],
            "trans": np.asarray(frames.trans), "rots": np.asarray(frames.rot),
            "seqres": aatype, "mask": np.ones(L, np.float32),
        }
        windows = split_windows(item, cfg.data.num_frames, cond_interval)
        all_atom14 = []
        for w in windows:
            key, k = jax.random.split(key)
            atom14, _ = engine.sample({k2: jnp.asarray(v) for k2, v in w.items()}, k)
            all_atom14.append(np.asarray(atom14)[0])
        full = np.concatenate(all_atom14, axis=0)
        atom14_to_pdb(full, aatype, os.path.join(a.out_dir, f"{name}.pdb"))
        print(f"{name}: upsampled {T_c} coarse -> {full.shape[0]} frames", flush=True)


if __name__ == "__main__":
    main()
