"""Peptide-simulation analysis CLI (reference src/scripts/analyze_peptide_sim.py).

Compares generated trajectories (multi-MODEL .pdb from sim_inference, or .npy
atom14) against reference MD (.npy atom14), writing the metric dict per
peptide to a pickle.
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

from ..analysis import analyze_sim
from ..geometry import frames as G
from ..geometry.protein import from_pdb_string
from ..geometry.tables import str_sequence_to_aatype


def load_traj_atom14(path: str, aatype: np.ndarray) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    import jax.numpy as jnp

    models = open(path).read().split("ENDMDL")
    frames = []
    for m in models:
        if "ATOM" not in m:
            continue
        prot = from_pdb_string(m)
        frames.append(prot.atom_positions)
    atom37 = np.stack(frames)
    T, L = atom37.shape[:2]
    return np.asarray(G.atom37_to_atom14(jnp.asarray(atom37), jnp.broadcast_to(jnp.asarray(aatype), (T, L))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mddir", type=str, required=True, help="dir of reference MD .npy files")
    p.add_argument("--pdbdir", type=str, required=True, help="dir of generated trajectories")
    p.add_argument("--suffix", type=str, default="")
    p.add_argument("--pdb_id", nargs="*", default=[])
    p.add_argument("--save", action="store_true")
    p.add_argument("--save_name", type=str, default="out.pkl")
    p.add_argument("--no_msm", action="store_true")
    p.add_argument("--no_decorr", action="store_true")
    p.add_argument("--truncate", type=int, default=None)
    p.add_argument("--msm_lag", type=int, default=10)
    p.add_argument("--tica_lag", type=int, default=1000)
    a = p.parse_args(argv)

    names = a.pdb_id or [
        f.split(".")[0] for f in os.listdir(a.pdbdir) if f.endswith(".pdb") and "_traj" not in f
    ]
    out = {}
    for name in names:
        aatype = str_sequence_to_aatype(name)
        ref = np.load(os.path.join(a.mddir, f"{name}{a.suffix}.npy")).astype(np.float32)
        traj = load_traj_atom14(os.path.join(a.pdbdir, f"{name}.pdb"), aatype)
        if a.truncate:
            traj = traj[: a.truncate]
        out[name] = analyze_sim(
            traj, ref, aatype, tica_lag=a.tica_lag, traj_msm_lag=a.msm_lag,
            no_msm=a.no_msm, no_decorr=a.no_decorr,
        )
        jsd = out[name]["JSD"]
        print(name, {k: round(v, 4) for k, v in list(jsd.items())[:6]}, flush=True)
    if a.save:
        with open(os.path.join(a.pdbdir, a.save_name), "wb") as f:
            pickle.dump(out, f)


if __name__ == "__main__":
    main()
