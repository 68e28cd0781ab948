"""Device mesh + sharding rules.

The framework scales with two mesh axes (SURVEY.md §2.7):
- ``dp``: data parallel — batch dim sharded, gradients all-reduced over ICI
  (replacing the reference's pl.Trainer DDP, src/train.py:46-68);
- ``sp``: sequence(frame) parallel — the T axis of (B, T, L, C) activations is
  sharded for the residue-attention stage; XLA's SPMD partitioner inserts the
  all-to-all before the frame-attention stage (Ulysses-style), replacing
  nothing in the reference (it has no sequence parallelism, SURVEY.md §2.7).

Everything goes through jit + NamedSharding: no manual collectives.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp_size: Optional[int] = None, sp_size: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp_size is None:
        dp_size = max(n // sp_size, 1)
    use = dp_size * sp_size
    if use > n:
        raise ValueError(f"mesh {dp_size}x{sp_size} needs {use} devices, have {n}")
    arr = np.array(devices[:use]).reshape(dp_size, sp_size)
    return Mesh(arr, ("dp", "sp"))


def batch_sharding(mesh: Mesh, frame_axis: Optional[int] = 1) -> NamedSharding:
    """Batch arrays: dim 0 over dp; optionally the frame dim over sp."""
    if frame_axis == 1 and mesh.shape["sp"] > 1:
        return NamedSharding(mesh, P("dp", "sp"))
    return NamedSharding(mesh, P("dp"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Batch fields whose dim 1 is the frame (T) axis and may be sharded over sp.
# seqres/mask are (B, L) — their dim 1 is the *residue* axis; sharding it over
# sp forces XLA to reshard them inside the step (silent all-to-alls), so they
# stay dp-only (VERDICT round-1 weak #5).
_FRAME_AXIS_KEYS = frozenset(
    {"atom14", "latents", "x", "x1", "x_cond", "torsions", "torsion_mask", "trans", "rots"}
)


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch dict onto the mesh (dp over dim 0, sp over frames).

    Sharding is by named field, not ndim: only arrays whose dim 1 is the frame
    axis (``_FRAME_AXIS_KEYS``) go on the sp axis; everything else is sharded
    over dp alone and replicated over sp.
    """
    out = {}
    for k, v in batch.items():
        if k == "name":
            continue
        frame_sharded = k in _FRAME_AXIS_KEYS and v.ndim >= 2 and mesh.shape["sp"] > 1
        spec = P("dp", "sp") if frame_sharded else P("dp")
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out
