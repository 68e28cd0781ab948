"""ESM-style rotary position embedding (half-split rotation).

Matches the RoPE used by the reference MHA (fair-esm RotaryEmbedding,
applied at src/mdgen/model/mha.py:356-357): inverse frequencies over the head
dim, cos/sin tables duplicated across the two halves, rotate_half chunking.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _tables(seq_len: int, dim: int):
    # pure numpy so the cached values are jit-trace-safe constants
    inv_freq = 1.0 / (10000 ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    t = np.arange(seq_len, dtype=np.float32)
    freqs = np.einsum("i,j->ij", t, inv_freq)
    emb = np.concatenate([freqs, freqs], axis=-1)
    return np.cos(emb), np.sin(emb)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q: jnp.ndarray, k: jnp.ndarray):
    """q (..., N_q, D), k (..., N_k, D); positions 0..N-1 along axis -2.

    Tables are sized to N_k (the reference computes them from k then truncates
    for q), so an appended bias-KV token sits at position N_q.
    """
    cos_np, sin_np = _tables(k.shape[-2], k.shape[-1])
    cos = jnp.asarray(cos_np, dtype=q.dtype)
    sin = jnp.asarray(sin_np, dtype=q.dtype)

    def rot(x):
        c = cos[: x.shape[-2]]
        s = sin[: x.shape[-2]]
        return x * c + _rotate_half(x) * s

    return rot(q), rot(k)
