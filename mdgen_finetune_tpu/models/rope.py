"""ESM-style rotary position embedding (half-split rotation).

Matches the RoPE used by the reference MHA (fair-esm RotaryEmbedding,
applied at src/mdgen/model/mha.py:356-357): inverse frequencies over the head
dim, cos/sin tables duplicated across the two halves, rotate_half chunking.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _tables(seq_len: int, dim: int):
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", t, inv_freq)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q: jnp.ndarray, k: jnp.ndarray):
    """q (..., N_q, D), k (..., N_k, D); positions 0..N-1 along axis -2.

    Tables are sized to N_k (the reference computes them from k then truncates
    for q), so an appended bias-KV token sits at position N_q.
    """
    cos, sin = _tables(k.shape[-2], k.shape[-1])
    cos = cos.astype(q.dtype)
    sin = sin.astype(q.dtype)

    def rot(x):
        c = cos[: x.shape[-2]]
        s = sin[: x.shape[-2]]
        return x * c + _rotate_half(x) * s

    return rot(q), rot(k)
