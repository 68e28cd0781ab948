"""Frozen MDGen prior wrapper for RTB fine-tuning.

Rebuild of MDGenSimulator (src/rtb_utils/priors.py:26-278): wraps a trained
flow-matching checkpoint as a fixed decoder from prior latents zs0 to all-atom
trajectories, supplies conditioning kwargs from the dataset, and evaluates
rollouts for the reward. Rollouts stay entirely on-device (the reference
round-trips through PDBFixer + pdb/xtc files, priors.py:205-243); PDB export
is only used when the OpenMM reward needs files.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MDGenConfig
from ..data import MDGenDataset
from ..data.featurize import featurize_atom14_batch
from ..geometry import tables as rc
from ..inference import InferenceEngine
from ..tasks import prep_batch


def rc_restype_order(c: str) -> int:
    return rc.restype_order.get(c, rc.unk_restype_index)


class MDGenSimulator:
    def __init__(self, cfg: MDGenConfig, params, split: str, data_dir: Optional[str] = None, batch_size: int = 1,
                 out_dir: Optional[str] = None, distinct_peptides: bool = False):
        """``distinct_peptides``: draw the ``batch_size`` dataset entries
        WITHOUT replacement so a conditional batch mixes different peptides
        (the reference's outsourced_train_conditional_posterior feeds one
        posterior many peptides, src/rtb_utils/gfn_diffusion.py:438-456)."""
        self.cfg = cfg
        self.engine = InferenceEngine(cfg, params)
        self.dataset = MDGenDataset(cfg, split, data_dir=data_dir)
        self.batch_size = batch_size
        self.distinct_peptides = distinct_peptides
        self._decode_jit = jax.jit(self._decode_with_zs0)
        self.rng = np.random.default_rng(cfg.train.seed)
        # sample/target-dist scratch space (reference out_dir + target_dist.pt,
        # src/rtb_utils/priors.py:88-93)
        self.out_dir = out_dir or os.path.join(cfg.workdir, "samples")
        self.target_dist_path = os.path.join(self.out_dir, "..", "target_dist.npz")
        self.target_dist: dict = {}
        if os.path.exists(self.target_dist_path):
            self.target_dist = dict(np.load(self.target_dist_path, allow_pickle=True)["d"].item())

    # ------------------------------------------------------------------
    def save_target_dist(self):
        os.makedirs(os.path.dirname(os.path.abspath(self.target_dist_path)), exist_ok=True)
        np.savez(self.target_dist_path, d=np.asarray(self.target_dist, dtype=object))

    def fix_and_save_pdbs(self, frames_atom14: np.ndarray, peptide: str, aatype: Optional[np.ndarray] = None) -> list:
        """Write one PDB per frame + a multi-MODEL trajectory + torsions npy
        (reference priors.py:205-243: atom14_to_pdb, then PDBFixer
        findMissingAtoms/addMissingAtoms per frame, then mdtraj-joined xtc).
        Our decode emits complete heavy-atom atom14 via ideal-geometry
        reconstruction (geometry/frames.py:149), so there are no missing
        atoms to fix; the trajectory rides as {peptide}_traj.pdb instead of
        xtc (no mdtraj dependency)."""
        from ..geometry import frames as G
        from ..geometry.protein import atom14_to_pdb, atom37_traj_to_pdb

        os.makedirs(self.out_dir, exist_ok=True)
        frames_atom14 = np.asarray(frames_atom14)  # (N, L, 14, 3)
        if aatype is None:
            name, seqres = self.dataset.entries[0]
            aatype = np.asarray([rc_restype_order(c) for c in seqres[: frames_atom14.shape[1]]], np.int32)
        aat = jnp.asarray(np.broadcast_to(aatype, (frames_atom14.shape[0], len(aatype))))
        atom37 = np.asarray(G.atom14_to_atom37(jnp.asarray(frames_atom14), aat))
        torsions, _ = G.atom37_to_torsions(jnp.asarray(atom37), aat)
        paths = []
        for i in range(len(frames_atom14)):
            p = os.path.join(self.out_dir, f"{peptide}_{i}.pdb")
            atom14_to_pdb(frames_atom14[i][None], aatype, p)
            paths.append(p)
        atom37_traj_to_pdb(atom37, aatype, os.path.join(self.out_dir, f"{peptide}_traj.pdb"))
        np.save(os.path.join(self.out_dir, f"{peptide}_torsions.npy"), np.asarray(torsions))
        return paths

    def ensure_target_dist(self, reward_fn, peptides: Optional[list] = None, sample_size: int = 64) -> dict:
        """Compute-and-cache the data energy distribution per peptide
        (reference gfn_diffusion.py:296-310): draw ``sample_size`` random
        frames from each peptide's raw trajectory, write fixed PDBs, score
        them with ``reward_fn(tmp_dir=...)``, persist the cache."""
        peptides = peptides or [n for n, _ in self.dataset.entries]
        todo = [p for p in peptides if p not in self.target_dist]
        if not todo:
            return self.target_dist
        for name, seqres in self.dataset.entries:
            if name not in todo:
                continue
            arr = np.load(self.dataset._path(name), mmap_mode="r")
            idx = self.rng.integers(0, len(arr), size=sample_size)
            frames = np.asarray(arr[np.sort(idx)], np.float32)
            aatype = np.asarray([rc_restype_order(c) for c in seqres], np.int32)
            self.fix_and_save_pdbs(frames, name, aatype=aatype)
        logs, _ = reward_fn(tmp_dir=self.out_dir)
        self.target_dist.update(logs)
        self.save_target_dist()
        return self.target_dist

    @property
    def latent_shape(self) -> tuple:
        return (self.cfg.data.num_frames, self.cfg.data.crop, self.cfg.latent_dim)

    # ------------------------------------------------------------------
    def get_batch(self) -> dict:
        if self.distinct_peptides and self.batch_size > 1:
            n_entries = len(self.dataset.entries)
            idxs = self.rng.choice(n_entries, size=min(self.batch_size, n_entries), replace=False)
            samples = [self.dataset.sample(self.rng, idx=int(i)) for i in idxs]
            raw = {
                "atom14": np.stack([s["atom14"] for s in samples]),
                "seqres": np.stack([s["seqres"] for s in samples]),
                "mask": np.stack([s["mask"] for s in samples]),
                "name": [s["name"] for s in samples],
            }
        else:
            raw = self.dataset.batch(self.rng, self.batch_size)
        feats = featurize_atom14_batch(
            jnp.asarray(raw["atom14"]), jnp.asarray(raw["seqres"]), jnp.asarray(raw["mask"])
        )
        feats["name"] = raw["name"]
        return feats

    def get_cond_args(self, batch: Optional[dict] = None) -> tuple:
        """(model_kwargs, batch) — the conditioning inputs the policies see
        (src/rtb_utils/priors.py:149-161)."""
        batch = batch or self.get_batch()
        prep = prep_batch(self.cfg, {k: v for k, v in batch.items() if k != "name"})
        return prep["model_kwargs"], batch

    # ------------------------------------------------------------------
    def _decode_with_zs0(self, params, batch, zs0):
        """zs0 -> trajectory via the frozen flow ODE (src/rtb_utils/priors.py:163-203)."""
        return self.engine._sample_with_zs0(params, batch, zs0)

    def sample(self, batch: dict, zs0: jnp.ndarray):
        """Returns (atom14 (B, T, L, 14, 3), aa_out)."""
        clean = {k: v for k, v in batch.items() if k != "name"}
        return self._decode_jit(self.engine.params, clean, zs0)
