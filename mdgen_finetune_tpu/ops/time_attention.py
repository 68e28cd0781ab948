"""Pallas TPU fused frame(time)-attention operating in (B, T, L, C) layout.

The denoiser's frame-attention stage (reference hot loop,
src/mdgen/model/latent_model.py:474-486) attends over T with (B, L) as batch.
The XLA composition needs two full-activation layout flips per layer
((B,T,L,C) <-> (B,L,T,C)) plus head-split transposes, and materializes the
(B*L, H, T, T) logits in HBM — measured at ~3 ms of pure copies per forward
at the bench shape and an HBM cap of B=32 (PERF.md). This kernel removes all
of it with a layout-native design:

- grid (B, L/BL, T/BQ): each program reads its Q block and the full (T, ...)
  K/V slice for a BL-residue group straight from the frame-major layout — no
  activation transpose ever exists in HBM;
- every VMEM tensor keeps the full C=H*D channel dim as its lane dim, so
  nothing is lane-padded (a (..., D=24) tile would waste 104/128 lanes);
- per-head separation happens through constant head-column masks: for head h,
  ``logits_h = (q * mask_h) @ k^T`` contracts the full C but is exactly the
  head-h dot product (q's other columns are zeroed). PV likewise accumulates
  ``(p_h @ v) * mask_h``. H x redundant MXU flops, but these matmuls contract
  K=C=384 at full MXU width — cheaper than D=24-wide matmuls and far cheaper
  than the transposes they replace;
- RoPE's rotate-half is two lane-rolls + constant sign masks (the (j, j+D/2)
  pairing within each head's D-lane block), no lane reshapes;
- the learned bias-KV token is appended as one extra key row, roped at
  position T (reference mha.py:265-280, 356-357);
- f32 logits live one head at a time in VMEM.

Backward: custom VJP whose backward is the VJP of the XLA reference
composition — forward-path speed is what the sampling/serving throughput
metric measures; the training backward stays numerically exact and reuses
XLA's transpose engine.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_attention import _attention_xla

_NEG_INF = -1e9


@functools.lru_cache(maxsize=16)
def _rope_tables_np(n_pos: int, head_dim: int, channels: int):
    """(n_pos, C) cos/sin tables tiled across heads, plus the constant lane
    mask for the rotate-half roll trick: rotate_half(x)[j] =
    -x[j + D/2] where (j mod D) < D/2 else x[j - D/2]."""
    inv_freq = 1.0 / (10000 ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))
    t = np.arange(n_pos, dtype=np.float32)
    freqs = np.einsum("i,j->ij", t, inv_freq)
    emb = np.concatenate([freqs, freqs], axis=-1)  # (n_pos, D)
    n_heads = channels // head_dim
    cos = np.tile(np.cos(emb), (1, n_heads))
    sin = np.tile(np.sin(emb), (1, n_heads))

    lane = np.arange(channels) % head_dim
    first_half = (lane < head_dim // 2).astype(np.float32)  # 1 where out = -x[j+half]
    return cos, sin, first_half


def _kernel(q_ref, k_ref, v_ref, bk_ref, bv_ref, mask_ref, cos_ref, sin_ref, fh_ref, o_ref,
            *, num_heads: int, head_dim: int):
    H, D = num_heads, head_dim
    BQ, BL, C = q_ref.shape[1:]
    T = k_ref.shape[1]
    i = pl.program_id(2)
    half = D // 2

    fh = fh_ref[...]  # (1, 1, C): 1 on each head's first half-lanes
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)

    def rotate_half(x32):
        # out[first] = -x[j+half]; out[second] = x[j-half]. The rolls are
        # global circular lane shifts; the head-boundary wraparound only lands
        # on lanes the masks zero out, so heads never leak into each other.
        # (tpu.roll only supports 32-bit data, hence the f32 working type.)
        take_right = pltpu.roll(x32, C - half, 2)  # out[j] = x[j+half] (shift >= 0)
        take_left = pltpu.roll(x32, half, 2)  # out[j] = x[j-half]
        return -take_right * fh + take_left * (1 - fh)

    def rope(x, pos_start, n):
        """x (n, BL, C); positions along dim 0."""
        start = pl.multiple_of(pos_start, 8)  # BQ is a multiple of 8
        cos = cos_ref[pl.ds(start, n)].astype(jnp.float32)  # (n, 1, C)
        sin = sin_ref[pl.ds(start, n)].astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        return (x32 * cos + rotate_half(x32) * sin).astype(x.dtype)

    q = rope(q_ref[0], i * BQ, BQ)  # (BQ, BL, C)
    bk = jnp.broadcast_to(bk_ref[...][None], (1, BL, C)).astype(k_ref.dtype)
    bv = jnp.broadcast_to(bv_ref[...][None], (1, BL, C)).astype(v_ref.dtype)
    k = rope(jnp.concatenate([k_ref[0], bk], axis=0), 0, T + 1)  # (T+1, BL, C)
    v = jnp.concatenate([v_ref[0], bv], axis=0)
    # Mosaic batched matmuls require the batch dim at position 0
    q = q.transpose(1, 0, 2)  # (BL, BQ, C)
    k = k.transpose(1, 0, 2)  # (BL, T+1, C)
    v = v.transpose(1, 0, 2)

    valid = jnp.concatenate(
        [mask_ref[0], jnp.ones((BL, 1), mask_ref.dtype)], axis=1
    )[:, None, :]  # (BL, 1, T+1)

    # Stacked-heads formulation: H per-head (BQ, C)@(C, T+1) dots would be
    # tiny, latency-bound matmuls. Instead stack H masked copies of q along
    # the row dim — ONE (H*BQ, C)@(C, T+1) MXU-shaped matmul computes every
    # head's logits row-block h at rows [h*BQ, (h+1)*BQ).
    head = jax.lax.broadcasted_iota(jnp.int32, (1, H, 1, 1), 1)
    hmask = jnp.logical_and(lane[None] >= head * D, lane[None] < (head + 1) * D)
    hmask = hmask.astype(q.dtype)  # (1, H, 1, C)
    qs = (q[:, None] * hmask).reshape(BL, H * BQ, C)
    logits = jax.lax.dot_general(
        qs, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (BL, H*BQ, T+1)
    logits = jnp.where(valid > 0, logits, _NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (BL, H*BQ, C)
    out = jnp.sum(pv.reshape(BL, H, BQ, C) * hmask.astype(jnp.float32), axis=1)

    o_ref[0] = out.transpose(1, 0, 2).astype(o_ref.dtype)


def _block_sizes(T: int, L: int, C: int, H: int, budget: int = 11 * 1024 * 1024):
    """(BL, BQ) or None: the residue block is L or 8 (Mosaic dim -2 rule); BQ
    is a multiple of 8, shrunk until the estimated VMEM working set fits.
    Returns None when the full-K/V-per-program design cannot fit (long T) or
    BQ would degenerate — the caller falls back to the XLA composition, whose
    inner fused_attention engages the flash kernel at long sequence lengths."""
    bl = 8 if (L > 8 and L % 8 == 0) else L

    def est(bq):
        q_like = 4 * bq * bl * C * 2  # q block (x2 buffers), roped q, out block
        k_like = 6 * T * bl * C * 2  # k, v blocks (x2 buffers), roped k, v+bias
        lpad = -(-(T + 1) // 128) * 128
        stacked = 2 * bl * H * bq * C * 2  # head-stacked q rows + pv (bf16)
        logit_like = 2 * bl * H * bq * lpad * 4  # logits + p over all heads
        out_acc = bq * bl * C * 4
        return q_like + k_like + stacked + logit_like + out_acc

    bq = -(-T // 8) * 8
    while est(bq) > budget and bq > 32:
        bq = max((bq // 2 + 7) // 8 * 8, 32)
    if est(bq) > budget:
        return None
    return bl, bq


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _pallas_fwd(q, k, v, bias_k, bias_v, key_valid, num_heads: int, interpret: bool = False):
    B, T, L, C = q.shape
    D = C // num_heads

    sizes = _block_sizes(T, L, C, num_heads)
    assert sizes is not None, "caller must gate on _block_sizes fitting VMEM"
    bl, bq = sizes
    n_l = pl.cdiv(L, bl)
    n_q = pl.cdiv(T, bq)
    pad = n_q * bq - T
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))

    # table rows must cover every q block's [i*bq, i*bq+bq) slice — a clamped
    # dynamic slice would silently corrupt the last block's positions
    n_pos = max(T + 1, n_q * bq)
    cos_np, sin_np, fh_np = _rope_tables_np(n_pos, D, C)
    cos = jnp.asarray(cos_np, q.dtype).reshape(n_pos, 1, C)
    sin = jnp.asarray(sin_np, q.dtype).reshape(n_pos, 1, C)
    fh = jnp.asarray(fh_np, jnp.float32).reshape(1, 1, C)
    bk = bias_k.reshape(1, C).astype(q.dtype)
    bv = bias_v.reshape(1, C).astype(q.dtype)

    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, head_dim=D),
        grid=(B, n_l, n_q),
        in_specs=[
            pl.BlockSpec((1, bq, bl, C), lambda b, l, i: (b, i, l, 0)),
            pl.BlockSpec((1, T, bl, C), lambda b, l, i: (b, 0, l, 0)),
            pl.BlockSpec((1, T, bl, C), lambda b, l, i: (b, 0, l, 0)),
            pl.BlockSpec((1, C), lambda b, l, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, l, i: (0, 0)),
            pl.BlockSpec((1, bl, T), lambda b, l, i: (b, l, 0)),
            pl.BlockSpec((n_pos, 1, C), lambda b, l, i: (0, 0, 0)),
            pl.BlockSpec((n_pos, 1, C), lambda b, l, i: (0, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, l, i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, bl, C), lambda b, l, i: (b, i, l, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_q * bq, L, C), q.dtype),
        interpret=interpret,
    )(q, k, v, bk, bv, key_valid.astype(jnp.float32), cos, sin, fh)
    return out[:, :T] if pad else out


# ---------------------------------------------------------------------------
def _xla_impl(q, k, v, bias_k, bias_v, key_valid, num_heads: int):
    """Reference composition: transpose to (B*L, T, ...), bias append, rope,
    masked softmax attention, transpose back. Used on CPU and as the VJP
    backward of the Pallas forward."""
    from ..models.rope import apply_rope

    B, T, L, C = q.shape
    H = num_heads
    D = C // H

    def to_rows(x):
        return x.transpose(0, 2, 1, 3).reshape(B * L, T, C)

    qr, kr, vr = to_rows(q), to_rows(k), to_rows(v)
    kr = jnp.concatenate([kr, jnp.broadcast_to(bias_k.reshape(1, 1, C).astype(kr.dtype), (B * L, 1, C))], 1)
    vr = jnp.concatenate([vr, jnp.broadcast_to(bias_v.reshape(1, 1, C).astype(vr.dtype), (B * L, 1, C))], 1)

    def split(x):
        return x.reshape(x.shape[0], x.shape[1], H, D).transpose(0, 2, 1, 3)

    qh, kh, vh = split(qr), split(kr), split(vr)
    qh, kh = apply_rope(qh, kh)
    valid = jnp.concatenate(
        [key_valid.reshape(B * L, T).astype(qh.dtype), jnp.ones((B * L, 1), qh.dtype)], axis=1
    )
    out = _attention_xla(qh, kh, vh, valid)  # (B*L, H, T, D)
    out = out.transpose(0, 2, 1, 3).reshape(B, L, T, C).transpose(0, 2, 1, 3)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _time_attention_pallas(q, k, v, bias_k, bias_v, key_valid, num_heads):
    return _pallas_fwd(q, k, v, bias_k, bias_v, key_valid, num_heads)


def _ta_fwd(q, k, v, bias_k, bias_v, key_valid, num_heads):
    return _pallas_fwd(q, k, v, bias_k, bias_v, key_valid, num_heads), (q, k, v, bias_k, bias_v, key_valid)


def _ta_bwd(num_heads, res, g):
    q, k, v, bias_k, bias_v, key_valid = res
    _, vjp = jax.vjp(lambda *a: _xla_impl(*a, num_heads), q, k, v, bias_k, bias_v, key_valid)
    dq, dk, dv, dbk, dbv, _ = vjp(g)
    return dq, dk, dv, dbk, dbv, None


_time_attention_pallas.defvjp(_ta_fwd, _ta_bwd)


def time_attention(q, k, v, bias_k, bias_v, key_valid=None, *, num_heads: int,
                   force_xla: bool = False, force_pallas: bool = False):
    """Frame attention in (B, T, L, C) layout.

    q pre-scaled by head_dim**-0.5 and already projected; k, v projected;
    bias_k/bias_v (1, 1, C) or (C,); key_valid (B, L, T) with 1 = attendable
    (the bias token is always attendable). Returns (B, T, L, C) pre-out-proj.
    """
    import os

    B, T, L, C = q.shape
    if key_valid is None:
        key_valid = jnp.ones((B, L, T), jnp.float32)
    env = os.environ.get("MDGEN_TIME_ATTENTION", "")  # "xla" | "pallas" override for A/B
    force_pallas = force_pallas or env == "pallas"
    # Default OFF: measured end-to-end at the bench shape the XLA composition
    # (whose inner fused_attention engages the flash kernel at long T) beats
    # this kernel — 2246 vs 1908 steps/s (PERF.md r2). Kept as a tested
    # building block behind force_pallas / the env override.
    use_pallas = force_pallas and _block_sizes(T, L, C, num_heads) is not None
    if use_pallas:
        return _time_attention_pallas(q, k, v, bias_k, bias_v, key_valid, num_heads)
    return _xla_impl(q, k, v, bias_k, bias_v, key_valid, num_heads)
