"""Upsampling analysis CLI (reference src/scripts/analyze_upsampling.py):
torsion autocovariance of generated vs full-rate vs subsampled MD."""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

from ..analysis import analyze_upsampling
from ..cli.analyze_sim import load_traj_atom14
from ..geometry.tables import str_sequence_to_aatype


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mddir", type=str, required=True, help="reference MD .npy dir")
    p.add_argument("--pdbdir", type=str, required=True)
    p.add_argument("--suffix", type=str, default="")
    p.add_argument("--pdb_id", nargs="*", default=[])
    p.add_argument("--subsample", type=int, default=100)
    a = p.parse_args(argv)

    names = a.pdb_id or [f.split(".")[0] for f in os.listdir(a.pdbdir) if f.endswith(".pdb")]
    for name in names:
        aatype = str_sequence_to_aatype(name)
        ref = np.load(os.path.join(a.mddir, f"{name}{a.suffix}.npy")).astype(np.float32)
        traj = load_traj_atom14(os.path.join(a.pdbdir, f"{name}.pdb"), aatype)
        out = analyze_upsampling(traj, ref, aatype, subsample=a.subsample)
        with open(os.path.join(a.pdbdir, f"{name}_autocorr.pkl"), "wb") as f:
            pickle.dump(out, f)
        print(name, "features:", len(out["md_autocorr"]), flush=True)


if __name__ == "__main__":
    main()
