"""Inpainting / sequence-design CLI (reference src/design_inference.py).

Finds windows of the reference MD whose endpoints sit in the argmax-flux
metastable pair, conditions the model on the full real trajectory (residues
{0,3} fixed), and inpaints coordinates + designs the sequence of residues
{1,2}. Metadata includes the designed sequences.
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.featurize import featurize_atom14_batch
from ..geometry.protein import atom14_to_pdb
from ..geometry.tables import str_sequence_to_aatype
from ..inference import InferenceEngine
from .msm_common import build_msm_metadata, pick_flux_states
from .sim_inference import load_params


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sim_ckpt", type=str, default=None)
    p.add_argument("--torch_ckpt", type=str, default=None)
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--mddir", type=str, default=None)
    p.add_argument("--suffix", type=str, default="")
    p.add_argument("--split", type=str, required=True)
    p.add_argument("--pdb_id", nargs="*", default=[])
    p.add_argument("--num_frames", type=int, default=100)
    p.add_argument("--num_batches", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=10)
    p.add_argument("--random_start_idx", action="store_true")
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--chunk_idx", type=int, default=0)
    p.add_argument("--n_chunks", type=int, default=1)
    p.add_argument("--seed", type=int, default=137)
    a = p.parse_args(argv)

    cfg, params = load_params(a)
    import dataclasses

    cfg = cfg.replace(data=dataclasses.replace(cfg.data, num_frames=a.num_frames))
    engine = InferenceEngine(cfg, params)
    os.makedirs(a.out_dir, exist_ok=True)
    mddir = a.mddir or a.data_dir

    import csv

    with open(a.split) as f:
        rows = list(csv.DictReader(f))
    chunk = np.array_split(np.arange(len(rows)), a.n_chunks)[a.chunk_idx]
    rng = np.random.default_rng(a.seed)
    key = jax.random.key(a.seed)

    for ridx in chunk:
        name, seqres = rows[ridx]["name"], rows[ridx]["seqres"]
        if a.pdb_id and name not in a.pdb_id:
            continue
        aatype = str_sequence_to_aatype(seqres)
        meta = build_msm_metadata(
            os.path.join(mddir, f"{name}{a.suffix}.npy"), aatype, f"{a.out_dir}/{name}_metadata.pkl"
        )
        if meta is None:
            continue
        msm, cmsm, ref_kmeans = meta["msm"], meta["cmsm"], meta["ref_kmeans"]
        start_state, end_state = pick_flux_states(cmsm, "max")
        ref_discrete = msm.metastable_assignments[ref_kmeans]

        arr = np.lib.format.open_memmap(os.path.join(a.data_dir, f"{name}{a.suffix}.npy"), mode="r")
        if cfg.data.frame_interval:
            arr = arr[:: cfg.data.frame_interval]
            ref_discrete = ref_discrete[:: cfg.data.frame_interval]
        ref_discrete = ref_discrete[: len(arr)]

        if a.random_start_idx:
            start_idxs = np.arange(max(len(arr) - a.num_frames, 1))
        else:
            is_start = ref_discrete == start_state
            is_end = ref_discrete == end_state
            trans = is_start[: -a.num_frames] * is_end[a.num_frames :]
            start_idxs = np.where(trans)[0]
            if not len(start_idxs):
                print("No transition path found for", name, "skipping...")
                continue

        mask = np.ones(len(aatype), np.float32)
        metadata = []
        for i in range(a.num_batches):
            for j in range(a.batch_size):
                si = int(rng.choice(start_idxs))
                window = np.asarray(arr[si : si + a.num_frames], dtype=np.float32)
                batch = featurize_atom14_batch(
                    jnp.asarray(window[None]), jnp.asarray(aatype[None]), jnp.asarray(mask[None])
                )
                key, k = jax.random.split(key)
                atom14, aa_out = engine.sample(batch, k)
                idx = i * a.batch_size + j
                path = os.path.join(a.out_dir, f"{name}_{idx}.pdb")
                atom14_to_pdb(np.asarray(atom14)[0], aatype, path)
                metadata.append(
                    {"name": name, "start_idx": si, "end_idx": si + a.num_frames,
                     "start_state": start_state, "end_state": end_state,
                     "aa_out": np.asarray(aa_out)[0].tolist(), "path": path}
                )
        with open(f"{a.out_dir}/{name}_metadata.json", "w") as f:
            json.dump(metadata, f)
        print(f"{name}: wrote {len(metadata)} design samples", flush=True)


if __name__ == "__main__":
    main()
