"""Pallas TPU fused attention for the factorized denoiser.

The denoiser's hot loop is masked softmax attention over frames (T up to 1001
keys incl. the bias-KV token) batched over B*L rows, and over residues batched
over B*T (src/mdgen/model/latent_model.py:466-486 in the reference). The XLA
path materializes the (rows, H, N, M) logits in HBM — at T=1000 that is
gigabytes per layer. This kernel keeps K/V and the logits resident in VMEM:

- grid (rows*H, N/BQ); each program loads its Q block and the full K/V
  (M <= MAX_KV keys after padding — 1001 x 128 lanes is ~0.5 MB, far under
  the ~16 MB VMEM budget), computes f32 logits + key-padding mask + softmax +
  PV on the MXU, and writes only the (BQ, D) output;
- head_dim (24 for the reference architecture) is lane-padded by Mosaic; the
  bandwidth win from never spilling logits dominates the padded-lane waste;
- RoPE, the q-scaling, and the appended bias token happen in the caller
  (cheap elementwise / concat), keeping the kernel a pure attention core.

Falls back to the einsum path off-TPU (tests run CPU) or when shapes are too
small for the kernel to pay off.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9
MAX_KV = 4096  # full-K/V-in-VMEM design limit (far above the 1001 max here)


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref):
    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (M, D)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, M)
    logits = jnp.where(mask_ref[0] > 0, logits, _NEG_INF)  # mask (1, M) broadcasts over BQ
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q",))
def _fused_attention_tpu(q, k, v, key_valid, block_q: int = 256):
    """q (R, N, D) pre-scaled/roped; k/v (R, M, D); key_valid (R, M) -> (R, N, D)."""
    R, N, D = q.shape
    M = k.shape[1]
    bq = min(block_q, N)
    n_q = pl.cdiv(N, bq)
    pad_n = n_q * bq - N
    if pad_n:
        q = jnp.pad(q, ((0, 0), (0, pad_n), (0, 0)))

    out = pl.pallas_call(
        _attn_kernel,
        grid=(R, n_q),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda r, i: (r, i, 0)),
            pl.BlockSpec((1, M, D), lambda r, i: (r, 0, 0)),
            pl.BlockSpec((1, M, D), lambda r, i: (r, 0, 0)),
            pl.BlockSpec((1, 1, M), lambda r, i: (r, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda r, i: (r, i, 0)),
        out_shape=jax.ShapeDtypeStruct((R, n_q * bq, D), q.dtype),
    )(q, k, v, key_valid[:, None, :])
    return out[:, :N] if pad_n else out


def fused_attention(q, k, v, key_valid=None, *, force_xla: bool = False):
    """Masked softmax attention: q (B, H, N, D) pre-scaled (and roped);
    k, v (B, H, M, D); key_valid (B, M) with 1 = attendable. Returns (B, H, N, D).
    """
    B, H, N, D = q.shape
    M = k.shape[2]
    use_pallas = (
        not force_xla
        and jax.default_backend() == "tpu"
        and M <= MAX_KV
        and N * M >= 64 * 64  # tiny shapes: XLA einsum wins
    )
    if key_valid is None:
        key_valid = jnp.ones((B, M), q.dtype)

    if use_pallas:
        qr = q.reshape(B * H, N, D)
        kr = k.reshape(B * H, M, D)
        vr = v.reshape(B * H, M, D)
        maskr = jnp.repeat(key_valid.astype(jnp.float32), H, axis=0)
        return _fused_attention_tpu(qr, kr, vr, maskr).reshape(B, H, N, D)

    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    logits = jnp.where(key_valid[:, None, None, :].astype(bool), logits, _NEG_INF)
    attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)
