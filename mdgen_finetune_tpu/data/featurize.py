"""On-device trajectory featurization: raw atom14 windows -> training batch.

The reference computes frames + torsions per sample inside DataLoader workers
on the CPU (src/mdgen/dataset.py:73-91). Here the host ships only the raw
atom14 float window (4.7x smaller than frames+torsions) and this jitted
function — fused into the train step — tokenizes on the TPU.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..geometry import frames as G


def featurize_atom14_batch(atom14: jnp.ndarray, seqres: jnp.ndarray, mask: jnp.ndarray) -> dict:
    """atom14 (B, T, L, 14, 3) Angstroms; seqres (B, L) int; mask (B, L) float.

    Returns the reference dataset's batch dict (src/mdgen/dataset.py:114-123):
    torsions (B, T, L, 7, 2), torsion_mask (B, L, 7), rots (B, T, L, 3, 3),
    trans (B, T, L, 3), seqres, mask. Padded residues (mask 0) get identity
    frames, matching the reference's Rigid.identity padding
    (src/mdgen/dataset.py:105-108).
    """
    B, T, L = atom14.shape[:3]
    atom14 = atom14.astype(jnp.float32)
    frames = G.atom14_to_frames(atom14)
    # aatype passed frame-FACTORED (B, L): the geometry selection matrices
    # stay per-residue and the contractions batch over frames
    atom37 = G.atom14_to_atom37(atom14, seqres)
    torsions, torsion_mask = G.atom37_to_torsions(atom37, seqres)

    valid = mask.astype(bool)
    eye = jnp.eye(3, dtype=atom14.dtype)
    rots = jnp.where(valid[:, None, :, None, None], frames.rot, eye)
    trans = jnp.where(valid[:, None, :, None], frames.trans, 0.0)
    torsions = jnp.where(valid[:, None, :, None, None], torsions, 0.0)
    # frame-factored torsion_mask is already (B, L, 7) — the reference's
    # frame-0 mask (dataset.py:91), which is frame-invariant by construction
    torsion_mask = torsion_mask * mask[..., None]

    return {
        "torsions": torsions,
        "torsion_mask": torsion_mask,
        "rots": rots,
        "trans": trans,
        "seqres": seqres,
        "mask": mask,
    }
