"""Synthetic peptide trajectory generator for tests and benchmarks.

The real data path requires OpenMM simulations + mdtraj preprocessing
(reference src/scripts/run_peptide_sim.py, prep_sims.py), which aren't
available in every environment. This generator produces *format-identical*
atom14 .npy memmaps with smooth, self-consistent dynamics: backbone frames
follow a random-walk on SE(3) and torsions follow wrapped Ornstein-Uhlenbeck
processes, then all-atom coordinates are reconstructed with the idealized
geometry. Good enough to exercise every code path (training, rollout,
analysis) with physically-plausible statistics.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..geometry import frames as G
from ..geometry import tables as rc
from ..geometry.rigid import Rigid, quat_to_rotmat


def synthesize_trajectory(
    seqres: str, num_frames: int, seed: int = 0, torsion_stiffness: float = 0.05
) -> np.ndarray:
    """Returns atom14 (T, L, 14, 3) float16 in Angstroms."""
    rng = np.random.default_rng(seed)
    L = len(seqres)
    aatype = rc.str_sequence_to_aatype(seqres)

    # backbone: residues laid out along x with small SE(3) random walk over time
    base_trans = np.stack([3.8 * np.arange(L), np.zeros(L), np.zeros(L)], axis=-1)
    quats = rng.normal(size=(L, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)

    trans = np.zeros((num_frames, L, 3))
    qs = np.zeros((num_frames, L, 4))
    trans[0], qs[0] = base_trans, quats
    for t in range(1, num_frames):
        trans[t] = trans[t - 1] + 0.05 * rng.normal(size=(L, 3))
        dq = qs[t - 1] + 0.02 * rng.normal(size=(L, 4))
        qs[t] = dq / np.linalg.norm(dq, axis=-1, keepdims=True)

    # torsions: wrapped OU around per-residue means (multi-modal-ish)
    means = rng.uniform(-np.pi, np.pi, size=(L, 7))
    angles = np.zeros((num_frames, L, 7))
    angles[0] = means + 0.3 * rng.normal(size=(L, 7))
    for t in range(1, num_frames):
        angles[t] = (
            angles[t - 1]
            + torsion_stiffness * np.sin(means - angles[t - 1])
            + 0.15 * rng.normal(size=(L, 7))
        )
    torsions = np.stack([np.sin(angles), np.cos(angles)], axis=-1)

    frames = Rigid(
        np.asarray(quat_to_rotmat(jnp.asarray(qs, jnp.float32))), jnp.asarray(trans, jnp.float32)
    )
    aat = jnp.broadcast_to(jnp.asarray(aatype), (num_frames, L))
    atom14 = G.frames_torsions_to_atom14(frames, jnp.asarray(torsions, jnp.float32), aat)
    return np.asarray(atom14, dtype=np.float16)


def make_synthetic_dataset(
    out_dir: str, peptides: list, num_frames: int = 200, suffix: str = "", seed: int = 0
) -> str:
    """Writes per-peptide .npy files + a split CSV; returns the CSV path.

    ``peptides``: sequences, or (name, seqres) pairs for long chains whose
    sequence would overflow a filename (ATLAS-style 256-mers)."""
    os.makedirs(out_dir, exist_ok=True)
    csv_path = os.path.join(out_dir, "split.csv")
    with open(csv_path, "w") as f:
        f.write("name,seqres\n")
        for i, pep in enumerate(peptides):
            name, seq = pep if isinstance(pep, tuple) else (pep, pep)
            f.write(f"{name},{seq}\n")
            arr = synthesize_trajectory(seq, num_frames, seed=seed + i)
            np.save(os.path.join(out_dir, f"{name}{suffix}.npy"), arr)
    return csv_path
