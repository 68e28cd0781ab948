"""Task conditioning: latent tokenization, loss masks, conditioning masks.

Pure-jnp rebuild of the reference wrapper's batch preparation
(src/mdgen/wrapper.py:283-365). ``prep_batch`` runs inside the jitted train /
inference step — offsets, quaternion sign fixes, and mask construction all
compile into the step function instead of running per batch on the host.

Latent token spec (src/mdgen/wrapper.py:195-202,304-335):
  [7-dim rigid offset (quat ‖ trans) | 14-dim torsions (7 x sin/cos)] = 21,
  doubled offsets (forward + reverse) for tps/inpainting -> 28,
  (+20 simplex channels appended by the transport when designing),
  111 = 37*3 raw atom37 coordinates under --no_frames.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from .config import MDGenConfig
from .geometry.rigid import Rigid

# residue index conventions for inpainting/design (src/mdgen/wrapper.py:41-43)
DESIGN_IDX = (1, 2)
COND_IDX = (0, 3)
DESIGN_MAP_TO_COND = (0, 0, 3, 3)


def get_offsets(ref_frame: Rigid, rigids: Rigid) -> jnp.ndarray:
    """Relative 7-tensors of ``rigids`` in ``ref_frame`` (src/mdgen/utils.py:7-14)."""
    return ref_frame.invert().compose(rigids).to_tensor_7()


def _fix_quat_sign(offsets: jnp.ndarray) -> jnp.ndarray:
    """Canonicalize quaternion sign to non-negative real part
    (src/mdgen/wrapper.py:308-309)."""
    sign = jnp.where(offsets[..., 0:1] < 0, -1.0, 1.0)
    return jnp.concatenate([offsets[..., :4] * sign, offsets[..., 4:]], axis=-1)


def make_cond_mask(cfg: MDGenConfig, B: int, T: int, L: int) -> jnp.ndarray:
    """(B, T, L) int mask of conditioning positions (src/mdgen/wrapper.py:337-346)."""
    task = cfg.task
    mask = jnp.zeros((B, T, L), dtype=jnp.int32)
    if task.sim_condition:
        mask = mask.at[:, 0].set(1)
    if task.tps_condition:
        mask = mask.at[:, 0].set(1).at[:, -1].set(1)
    if task.cond_interval:
        mask = mask.at[:, :: task.cond_interval].set(1)
    if task.inpainting or task.dynamic_mpnn or task.mpnn:
        mask = mask.at[:, :, jnp.asarray(COND_IDX)].set(1)
    return mask


def prep_batch(cfg: MDGenConfig, batch: Dict[str, jnp.ndarray]) -> Dict:
    """Batch dict -> {latents, loss_mask, model_kwargs} (src/mdgen/wrapper.py:283-365)."""
    task = cfg.task
    if task.no_frames:
        return _prep_batch_no_frames(cfg, batch)

    rigids = Rigid(batch["rots"], batch["trans"])  # (B, T, L)
    B, T, L = rigids.shape

    if task.design_key_frames:
        key_idx = jnp.asarray(DESIGN_MAP_TO_COND)
        first = Rigid(rigids.rot[:, :1, key_idx], rigids.trans[:, :1, key_idx])
        last = Rigid(rigids.rot[:, -1:, key_idx], rigids.trans[:, -1:, key_idx])
        rigids = Rigid.cat([first, rigids[:, 1:-1], last], axis=1)

    if task.no_offsets:
        offsets = rigids.to_tensor_7()
    else:
        offsets = get_offsets(rigids[:, 0:1], rigids)
    offsets = _fix_quat_sign(offsets)

    frame_loss_mask = jnp.broadcast_to(batch["mask"][..., None], (B, L, 7))
    torsion_loss_mask = jnp.broadcast_to(
        batch["torsion_mask"][..., None], (B, L, 7, 2)
    ).reshape(B, L, 14)

    if cfg.doubled_offsets:
        offsets_r = _fix_quat_sign(get_offsets(rigids[:, -1:], rigids))
        offsets = jnp.concatenate([offsets, offsets_r], axis=-1)
        frame_loss_mask = jnp.concatenate([frame_loss_mask, frame_loss_mask], axis=-1)

    torsions = batch["torsions"].reshape(B, T, L, 14)
    if task.no_torsion:
        torsions = jnp.zeros_like(torsions)
    elif task.no_design_torsion:
        torsions = torsions.at[:, :, jnp.asarray(DESIGN_IDX)].set(0.0)
    latents = jnp.concatenate([offsets, torsions], axis=-1)

    if task.supervise_all_torsions:
        torsion_loss_mask = jnp.ones_like(torsion_loss_mask)
    elif task.supervise_no_torsions:
        torsion_loss_mask = jnp.zeros_like(torsion_loss_mask)

    loss_mask = jnp.concatenate([frame_loss_mask, torsion_loss_mask], axis=-1)
    loss_mask = jnp.broadcast_to(loss_mask[:, None], (B, T, L, loss_mask.shape[-1]))

    cond_mask = make_cond_mask(cfg, B, T, L)
    aatype_mask = jnp.ones_like(batch["seqres"])
    if task.design:
        aatype_mask = aatype_mask.at[:, jnp.asarray(DESIGN_IDX)].set(0)

    return {
        "rigids": rigids,
        "latents": latents,
        "loss_mask": loss_mask,
        "model_kwargs": {
            "start_frames": rigids[:, 0],
            "end_frames": rigids[:, -1],
            "mask": jnp.broadcast_to(batch["mask"][:, None], (B, T, L)),
            "aatype": jnp.where(aatype_mask.astype(bool), batch["seqres"], 20),
            "x_cond": jnp.where(cond_mask[..., None].astype(bool), latents, 0.0),
            "x_cond_mask": cond_mask,
        },
    }


def _prep_batch_no_frames(cfg: MDGenConfig, batch: Dict[str, jnp.ndarray]) -> Dict:
    """Raw-coordinate ablation (src/mdgen/wrapper.py:254-280); fixes the
    reference's NameError on the atom37 mask (src/mdgen/dataset.py:87)."""
    atom37 = batch["atom37"]
    B, T, L = atom37.shape[:3]
    latents = atom37.reshape(B, T, L, 111)
    # batch["mask"] here is the per-atom37 mask (B, L, 37)
    mask = jnp.broadcast_to(batch["mask"][:, None, :, 1], (B, T, L))
    loss_mask = jnp.broadcast_to(batch["mask"][:, None, :, :, None], (B, T, L, 37, 3)).reshape(B, T, L, 111)

    cond_mask = jnp.zeros((B, T, L), dtype=jnp.int32)
    if cfg.task.sim_condition:
        cond_mask = cond_mask.at[:, 0].set(1)

    return {
        "latents": latents,
        "loss_mask": loss_mask,
        "model_kwargs": {
            "mask": mask,
            "aatype": batch["seqres"],
            "x_cond": jnp.where(cond_mask[..., None].astype(bool), latents, 0.0),
            "x_cond_mask": cond_mask,
        },
    }
