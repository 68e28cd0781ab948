"""LoRA adapters as parameter-addition pytrees over flax Dense kernels.

Replaces the reference's peft wrapping of the posterior policy
(src/rtb_utils/gfn_diffusion.py:58-83): low-rank (A, B) factors are attached
to targeted kernels and merged functionally — W_eff = W + (alpha/r) * A @ B —
before each forward. Merging is a handful of (in, r) x (r, out) matmuls on a
~20M-param model, which XLA fuses into the step; the base params stay frozen
so only the adapter pytree receives gradients.
"""
from __future__ import annotations

import re
from typing import Callable

import flax.traverse_util as traverse
import jax
import jax.numpy as jnp


# reference target modules (gfn_diffusion.py:59-76): MHA + IPA projections,
# MLP fc1/fc2, the output head linear, and the timestep embedder MLP
_DEFAULT_PATTERNS = [
    r".*(q_proj|k_proj|v_proj|out_proj)/kernel$",
    r".*linear_(q|kv|q_points|kv_points|out)/kernel$",
    r".*fc1/kernel$",
    r".*fc2/kernel$",
    r".*emb_to_latent/linear/kernel$",
    r".*t_embedder/mlp[02]/kernel$",
]


def lora_targets_default(path: str) -> bool:
    return any(re.match(p, path) for p in _DEFAULT_PATTERNS)


def lora_init(
    key: jax.Array, params: dict, rank: int = 32, targets: Callable[[str], bool] = lora_targets_default
) -> dict:
    """Flat dict {path: {"a": (in, r), "b": (r, out)}} for each targeted kernel.

    a ~ N(0, 1/r) Kaiming-style, b = 0 (so the adapter starts as identity),
    matching peft's initialization.
    """
    flat = traverse.flatten_dict(params, sep="/")
    out = {}
    for path, w in flat.items():
        if w.ndim == 2 and targets(path):
            key, sub = jax.random.split(key)
            fan_in = w.shape[0]
            out[path] = {
                "a": jax.random.normal(sub, (fan_in, rank), w.dtype) / jnp.sqrt(rank),
                "b": jnp.zeros((rank, w.shape[1]), w.dtype),
            }
    return out


def lora_merge(params: dict, lora: dict, scale: float = 1.0) -> dict:
    """Return params with W + scale * A @ B applied at each adapted kernel."""
    flat = dict(traverse.flatten_dict(params, sep="/"))
    for path, ab in lora.items():
        flat[path] = flat[path] + scale * (ab["a"] @ ab["b"])
    return traverse.unflatten_dict(flat, sep="/")
