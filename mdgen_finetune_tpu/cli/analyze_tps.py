"""TPS ensemble analysis CLI (reference src/scripts/analyze_peptide_tps.py).

Scores generated transition-path ensembles (from tps_inference) against MSM
bridge samples: mean path probability, validity rate, state-visitation JSD.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np

from ..analysis import analyze_tps_ensemble
from ..cli.analyze_sim import load_traj_atom14
from ..geometry.tables import str_sequence_to_aatype


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pdbdir", type=str, required=True, help="tps_inference output dir")
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--pdb_id", nargs="*", default=[])
    p.add_argument("--save", action="store_true")
    p.add_argument("--save_name", type=str, default="out.pkl")
    a = p.parse_args(argv)
    os.makedirs(a.outdir, exist_ok=True)

    names = a.pdb_id or sorted(
        {f.split("_")[0] for f in os.listdir(a.pdbdir) if f.endswith(".pdb")}
    )
    results = {}
    for name in names:
        meta_pkl = os.path.join(a.pdbdir, f"{name}_metadata.pkl")
        meta_json = os.path.join(a.pdbdir, f"{name}_metadata.json")
        if not (os.path.exists(meta_pkl) and os.path.exists(meta_json)):
            continue
        with open(meta_pkl, "rb") as f:
            meta = pickle.load(f)
        entries = json.load(open(meta_json))
        aatype = str_sequence_to_aatype(name)
        trajs = [load_traj_atom14(e["path"], aatype) for e in entries]
        out = analyze_tps_ensemble(
            trajs, aatype, meta, entries[0]["start_state"], entries[0]["end_state"]
        )
        results[name] = out
        print(name, {k: round(float(v), 4) for k, v in out.items() if np.isscalar(v) or getattr(v, "ndim", 1) == 0})
        with open(os.path.join(a.outdir, f"{name}.pkl"), "wb") as f:
            pickle.dump(out, f)
    if a.save:
        with open(os.path.join(a.outdir, a.save_name), "wb") as f:
            pickle.dump(results, f)


if __name__ == "__main__":
    main()
