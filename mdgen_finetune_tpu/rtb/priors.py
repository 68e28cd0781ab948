"""Frozen MDGen prior wrapper for RTB fine-tuning.

Rebuild of MDGenSimulator (src/rtb_utils/priors.py:26-278): wraps a trained
flow-matching checkpoint as a fixed decoder from prior latents zs0 to all-atom
trajectories, supplies conditioning kwargs from the dataset, and evaluates
rollouts for the reward. Rollouts stay entirely on-device (the reference
round-trips through PDBFixer + pdb/xtc files, priors.py:205-243); PDB export
is only used when the OpenMM reward needs files.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MDGenConfig
from ..data import MDGenDataset
from ..data.featurize import featurize_atom14_batch
from ..inference import InferenceEngine
from ..tasks import prep_batch


class MDGenSimulator:
    def __init__(self, cfg: MDGenConfig, params, split: str, data_dir: Optional[str] = None, batch_size: int = 1):
        self.cfg = cfg
        self.engine = InferenceEngine(cfg, params)
        self.dataset = MDGenDataset(cfg, split, data_dir=data_dir)
        self.batch_size = batch_size
        self._decode_jit = jax.jit(self._decode_with_zs0)
        self.rng = np.random.default_rng(cfg.train.seed)

    @property
    def latent_shape(self) -> tuple:
        return (self.cfg.data.num_frames, self.cfg.data.crop, self.cfg.latent_dim)

    # ------------------------------------------------------------------
    def get_batch(self) -> dict:
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
