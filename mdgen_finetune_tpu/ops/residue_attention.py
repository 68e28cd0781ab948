"""Pallas TPU fused residue-attention for SMALL L in (B, T, L, C) layout.

The denoiser's residue-attention stage attends over L with (B, T) as batch
(reference src/mdgen/model/latent_model.py:466-472). At the 4AA configs L=4:
the XLA composition reshapes to (B*T, L, C), head-splits to tensors whose
minor dims are 4/5 keys x 24 channels — every op runs on 128-lane tiles that
are ~95% padding, and the stage measures 8.7 ms of the 15.1 ms bench forward
(branch ablation, PERF.md r2). For tiny L the attention is mathematically
just L*(L+1) weighted averages, so this kernel computes it without EVER
forming head-minor tensors:

- logits via pairwise products: for residue pair (i, j),
  ``e_ij = q_i * k_j`` (elementwise over C) and ``logits[i,j,h] = e_ij @ S``
  where S is the constant (C, H) head-summing matrix — one MXU matmul with a
  K=384 contraction for ALL pairs and heads at once;
- softmax over j as slice-wise max/sum across the L+1 pair blocks (major-dim
  ops only);
- PV by expanding p back to channels with S^T (one matmul) and accumulating
  ``p_exp[i,j] * v_j``;
- RoPE over residue positions with the rotate-half roll trick; the learned
  bias-KV token is one extra key at position L (mha.py:265-280, 356-357).

Everything stays in (rows, L, C) with C as the lane dim — zero lane padding,
zero transposes. Gated to L <= MAX_L; larger L falls back to the XLA path.

Backward: custom VJP whose backward is the VJP of the XLA reference
composition (numerically exact, reuses XLA's transpose engine).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .time_attention import _xla_impl as _time_xla_impl

MAX_L = 8  # pair count L*(L+1) and per-pair buffers grow quadratically

_NEG_INF = -1e9


@functools.lru_cache(maxsize=16)
def _tables_np(n_pos: int, head_dim: int, channels: int):
    """Residue-position cos/sin (n_pos, C), rotate-half first-half lane mask
    (C,), and the (C, H) head-summing matrix."""
    inv_freq = 1.0 / (10000 ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))
    t = np.arange(n_pos, dtype=np.float32)
    freqs = np.einsum("i,j->ij", t, inv_freq)
    emb = np.concatenate([freqs, freqs], axis=-1)
    n_heads = channels // head_dim
    cos = np.tile(np.cos(emb), (1, n_heads))
    sin = np.tile(np.sin(emb), (1, n_heads))
    lane = np.arange(channels) % head_dim
    first_half = (lane < head_dim // 2).astype(np.float32)
    S = np.zeros((channels, n_heads), np.float32)
    S[np.arange(channels), np.arange(channels) // head_dim] = 1.0
    return cos, sin, first_half, S


def _kernel(q_ref, k_ref, v_ref, bk_ref, bv_ref, mask_ref, cos_ref, sin_ref, fh_ref, s_ref,
            o_ref, *, head_dim: int):
    BT, L, C = q_ref.shape[1:]
    J = L + 1
    D = head_dim
    half = D // 2

    fh = fh_ref[...]  # (1, 1, C)
    S = s_ref[...]  # (C, H)

    def rotate_half(x32):
        take_right = pltpu.roll(x32, C - half, 2)
        take_left = pltpu.roll(x32, half, 2)
        return -take_right * fh + take_left * (1 - fh)

    def rope(x, n):
        # rolls need 32-bit data; the result returns to the input dtype so the
        # big (BT, L, J, C) intermediates stay half-width on TPU
        cos = cos_ref[:, :n].astype(jnp.float32)  # (1, n, C)
        sin = sin_ref[:, :n].astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        return (x32 * cos + rotate_half(x32) * sin).astype(x.dtype)

    q = rope(q_ref[0], L)  # (BT, L, C)
    bk = jnp.broadcast_to(bk_ref[...][None], (BT, 1, C)).astype(k_ref.dtype)
    bv = jnp.broadcast_to(bv_ref[...][None], (BT, 1, C)).astype(v_ref.dtype)
    k = rope(jnp.concatenate([k_ref[0], bk], axis=1), J)  # (BT, J, C)
    v = jnp.concatenate([v_ref[0], bv], axis=1)

    # all-pairs products via one broadcasted multiply (no per-pair slicing),
    # then ONE matmul sums channels within each head
    e = q[:, :, None, :] * k[:, None, :, :]  # (BT, L, J, C)
    logits = jax.lax.dot_general(
        e, S.astype(e.dtype), (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BT, L, J, H) f32

    valid = jnp.concatenate([mask_ref[0], jnp.ones((BT, 1), mask_ref.dtype)], axis=1)
    logits = jnp.where(valid[:, None, :, None] > 0, logits, _NEG_INF)
    m = jnp.max(logits, axis=2, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=2, keepdims=True)  # (BT, L, J, H) f32
    # expand head weights back to channels: (..., H) @ (H -> C)
    # this dot stays f32: a bf16 lhs with a 16-lane contraction dim hits an
    # unsupported relayout in Mosaic
    p_exp = jax.lax.dot_general(
        p, S, (((3,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(v.dtype)  # (BT, L, J, C)
    out = jnp.sum(
        (p_exp * v[:, None, :, :]).astype(jnp.float32), axis=2
    )  # (BT, L, C): f32 accumulation over the J keys
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret", "block_t"))
def _pallas_fwd(q, k, v, bias_k, bias_v, key_valid, num_heads: int, interpret: bool = False,
                block_t: int = 64):
    B, T, L, C = q.shape
    D = C // num_heads

    bt = min(-(-T // 8) * 8, block_t)
    n_t = pl.cdiv(T, bt)
    pad = n_t * bt - T
    if pad:
        zpad = ((0, 0), (0, pad), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, zpad), jnp.pad(k, zpad), jnp.pad(v, zpad)
        key_valid = jnp.pad(key_valid, ((0, 0), (0, pad), (0, 0)), constant_values=1.0)

    cos_np, sin_np, fh_np, s_np = _tables_np(L + 1, D, C)
    cos = jnp.asarray(cos_np, jnp.float32).reshape(1, L + 1, C)
    sin = jnp.asarray(sin_np, jnp.float32).reshape(1, L + 1, C)
    fh = jnp.asarray(fh_np, jnp.float32).reshape(1, 1, C)
    S = jnp.asarray(s_np, jnp.float32)
    bk = bias_k.reshape(1, C).astype(q.dtype)
    bv = bias_v.reshape(1, C).astype(q.dtype)

    out = pl.pallas_call(
        functools.partial(_kernel, head_dim=D),
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec((1, bt, L, C), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, bt, L, C), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, bt, L, C), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, bt, L), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, L + 1, C), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((1, L + 1, C), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((C, num_heads), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, L, C), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_t * bt, L, C), q.dtype),
        interpret=interpret,
    )(q, k, v, bk, bv, key_valid.astype(jnp.float32), cos, sin, fh, S)
    return out[:, :T] if pad else out


# ---------------------------------------------------------------------------
def _xla_impl(q, k, v, bias_k, bias_v, key_valid, num_heads: int):
    """Reference composition over the residue axis: rows are (B*T); reuses the
    time-attention reference with T and L swapped."""
    swap = lambda x: x.transpose(0, 2, 1, 3)
    # time_attention's reference attends over dim 1 with dim 2 as batch; after
    # the swap the attend dim is L and the batch dim is T, so its key_valid
    # format (B, batch, attend) is exactly our (B, T, L) input
    out = _time_xla_impl(swap(q), swap(k), swap(v), bias_k, bias_v, key_valid, num_heads)
    return swap(out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _residue_attention_pallas(q, k, v, bias_k, bias_v, key_valid, num_heads):
    return _pallas_fwd(q, k, v, bias_k, bias_v, key_valid, num_heads)


def _ra_fwd(q, k, v, bias_k, bias_v, key_valid, num_heads):
    return _pallas_fwd(q, k, v, bias_k, bias_v, key_valid, num_heads), (q, k, v, bias_k, bias_v, key_valid)


def _ra_bwd(num_heads, res, g):
    q, k, v, bias_k, bias_v, key_valid = res
    _, vjp = jax.vjp(lambda *a: _xla_impl(*a, num_heads), q, k, v, bias_k, bias_v, key_valid)
    dq, dk, dv, dbk, dbv, _ = vjp(g)
    return dq, dk, dv, dbk, dbv, None


_residue_attention_pallas.defvjp(_ra_fwd, _ra_bwd)


def residue_attention(q, k, v, bias_k, bias_v, key_valid=None, *, num_heads: int,
                      force_xla: bool = False, force_pallas: bool = False):
    """Residue attention in (B, T, L, C) layout: attends over L, batch (B, T).

    q pre-scaled by head_dim**-0.5 and projected; k, v projected; bias_k /
    bias_v (1, 1, C) or (C,); key_valid (B, T, L) with 1 = attendable (the
    bias token is always attendable). Returns (B, T, L, C) pre-out-proj.
    """
    import os

    B, T, L, C = q.shape
    if key_valid is None:
        key_valid = jnp.ones((B, T, L), jnp.float32)
    env = os.environ.get("MDGEN_RESIDUE_ATTENTION", "")  # "xla" | "pallas" A/B override
    force_xla = force_xla or env == "xla"
    force_pallas = force_pallas or env == "pallas"
    use_pallas = force_pallas or (
        not force_xla and jax.default_backend() == "tpu" and L <= MAX_L
    )
    if use_pallas:
        return _residue_attention_pallas(q, k, v, bias_k, bias_v, key_valid, num_heads)
    return _xla_impl(q, k, v, bias_k, bias_v, key_valid, num_heads)
