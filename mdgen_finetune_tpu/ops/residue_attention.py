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

from .time_attention import _blocked_fits, _time_attention_pallas_blocked
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


def _kernel(q_ref, k_ref, v_ref, bk_ref, bv_ref, bias_ref, cos_ref, sin_ref, fh_ref, s_ref,
            st_ref, o_ref, *, head_dim: int, channels: int, base2: bool = False):
    """Pair-loop formulation: inputs ride as (rows, L*C) — a FREE contiguous
    reshape of (B, T, L, C) — so every residue slice is a static lane-tile
    slice (C = a whole number of 128-lane tiles), and the unrolled L*(L+1)
    pair loop is all 2D (rows, C) vector ops + (rows, C)@(C, H) MXU matmuls.
    The earlier all-pairs (rows, L, J, C) formulation forced Mosaic to loop
    4D dot_generals ~15x slower than this (PERF.md r2)."""
    C = channels
    BT, LC = q_ref.shape
    L = LC // C
    J = L + 1
    half = head_dim // 2

    fh = fh_ref[...]  # (1, C)
    S = s_ref[...]  # (C, H) f32
    St = st_ref[...]  # (H, C) f32

    def rotate_half(x32):
        take_right = pltpu.roll(x32, C - half, 1)
        take_left = pltpu.roll(x32, half, 1)
        return -take_right * fh + take_left * (1 - fh)

    def rope(x, pos):
        cos = cos_ref[pos].astype(jnp.float32)  # (1, C)
        sin = sin_ref[pos].astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        return (x32 * cos + rotate_half(x32) * sin).astype(x.dtype)

    q_all, k_all, v_all = q_ref[...], k_ref[...], v_ref[...]
    qs = [rope(q_all[:, i * C:(i + 1) * C], i) for i in range(L)]  # each (BT, C)
    ks = [rope(k_all[:, j * C:(j + 1) * C], j) for j in range(L)]
    ks.append(rope(jnp.broadcast_to(bk_ref[...], (BT, C)), L))
    vs = [v_all[:, j * C:(j + 1) * C] for j in range(L)]
    vs.append(jnp.broadcast_to(bv_ref[...], (BT, C)))

    Sd = S.astype(qs[0].dtype)
    bias = bias_ref[...]  # (BT, J)
    for i in range(L):
        # logits for query i against all J keys: (BT, C) elementwise product,
        # then one (BT, C)@(C, H) head-summing matmul per key
        ls = []
        for j in range(J):
            e = qs[i] * ks[j]
            l = jax.lax.dot_general(
                e, Sd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )  # (BT, H)
            ls.append(l + bias[:, j:j + 1])
        if base2:
            # q carries scale * LOG2E (ops/time_attention docstring): no max
            # tree — exp2 with a static overflow cap (exp2(100) = 1.3e30,
            # sum <= J * 2^100 << f32 max), epsilon-guarded denominator
            ps = [jnp.exp2(jnp.minimum(l, 100.0)) for l in ls]
        else:
            m = ls[0]
            for l in ls[1:]:
                m = jnp.maximum(m, l)
            ps = [jnp.exp(l - m) for l in ls]
        denom = ps[0]
        for p in ps[1:]:
            denom = denom + p
        inv = 1.0 / (denom + 1e-30 if base2 else denom)
        acc = jnp.zeros((BT, C), jnp.float32)
        for j in range(J):
            # expand head weights to channels ((BT, H) @ (H, C), f32 — a bf16
            # lhs with a 16-lane contraction dim hits an unsupported Mosaic
            # relayout) and accumulate p_ij * v_j
            p_exp = jax.lax.dot_general(
                ps[j] * inv, St, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )  # (BT, C)
            acc = acc + p_exp * vs[j].astype(jnp.float32)
        o_ref[:, i * C:(i + 1) * C] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret", "block_rows",
                                             "base2"))
def _pallas_fwd(q, k, v, bias_k, bias_v, key_valid, num_heads: int, interpret: bool = False,
                block_rows: int = 512, base2: bool = False):
    B, T, L, C = q.shape
    D = C // num_heads
    J = L + 1

    # (B, T) rows are independent: flatten them and fold the tiny residue dim
    # into LANES — (rows, L*C) is a free contiguous reshape of (B, T, L, C),
    # and per-residue slices inside the kernel are static whole-lane-tile
    # slices (C is a multiple of 128). No transpose ever materializes; the
    # kernel grid is a handful of fat row-block programs instead of
    # B x (T / block) slivers.
    rows = B * T
    q, k, v = (a.reshape(rows, L * C) for a in (q, k, v))
    # additive logit bias per (row, key j): 0 for attendable, -1e9 for masked;
    # the learned bias token (j = L) is always attendable
    bias = (key_valid.reshape(rows, L).astype(jnp.float32) - 1.0) * -_NEG_INF
    bias = jnp.concatenate([bias, jnp.zeros((rows, 1), jnp.float32)], axis=1)  # (rows, J)

    # prefer a block size that divides the row count: the residual jnp.pad
    # path triggers a backend compiler crash when fused into large graphs at
    # some batch sizes (observed at B=64, r2), and padding wastes work anyway
    br = min(-(-rows // 8) * 8, block_rows)
    if rows % br:
        for cand in range(block_rows, 31, -8):
            if rows % cand == 0:
                br = cand
                break
    n_r = pl.cdiv(rows, br)
    pad = n_r * br - rows
    if pad:
        q, k, v = (jnp.pad(a, ((0, pad), (0, 0))) for a in (q, k, v))
        bias = jnp.pad(bias, ((0, pad), (0, 0)))

    cos_np, sin_np, fh_np, s_np = _tables_np(J, D, C)
    cos = jnp.asarray(cos_np, jnp.float32).reshape(J, 1, C)
    sin = jnp.asarray(sin_np, jnp.float32).reshape(J, 1, C)
    fh = jnp.asarray(fh_np, jnp.float32).reshape(1, C)
    S = jnp.asarray(s_np, jnp.float32)
    bk = bias_k.reshape(1, C).astype(q.dtype)
    bv = bias_v.reshape(1, C).astype(q.dtype)

    out = pl.pallas_call(
        functools.partial(_kernel, head_dim=D, channels=C, base2=base2),
        grid=(n_r,),
        in_specs=[
            pl.BlockSpec((br, L * C), lambda i: (i, 0)),
            pl.BlockSpec((br, L * C), lambda i: (i, 0)),
            pl.BlockSpec((br, L * C), lambda i: (i, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((br, J), lambda i: (i, 0)),
            pl.BlockSpec((J, 1, C), lambda i: (0, 0, 0)),
            pl.BlockSpec((J, 1, C), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((C, num_heads), lambda i: (0, 0)),
            pl.BlockSpec((num_heads, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((br, L * C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_r * br, L * C), q.dtype),
        interpret=interpret,
    )(q, k, v, bk, bv, bias, cos, sin, fh, S, S.T)
    out = out[:rows] if pad else out
    return out.reshape(B, T, L, C)


# ---------------------------------------------------------------------------
def _xla_impl(q, k, v, bias_k, bias_v, key_valid, num_heads: int, base2: bool = False):
    """Reference composition over the residue axis: rows are (B*T); reuses the
    time-attention reference with T and L swapped."""
    swap = lambda x: x.transpose(0, 2, 1, 3)
    # time_attention's reference attends over dim 1 with dim 2 as batch; after
    # the swap the attend dim is L and the batch dim is T, so its key_valid
    # format (B, batch, attend) is exactly our (B, T, L) input
    out = _time_xla_impl(swap(q), swap(k), swap(v), bias_k, bias_v, key_valid, num_heads,
                         base2=base2)
    return swap(out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _residue_attention_pallas(q, k, v, bias_k, bias_v, key_valid, num_heads,
                              interpret=False, base2=False):
    return _pallas_fwd(q, k, v, bias_k, bias_v, key_valid, num_heads, interpret=interpret,
                       base2=base2)


def _ra_fwd(q, k, v, bias_k, bias_v, key_valid, num_heads, interpret, base2):
    return (_pallas_fwd(q, k, v, bias_k, bias_v, key_valid, num_heads, interpret=interpret,
                        base2=base2),
            (q, k, v, bias_k, bias_v, key_valid))


def _ra_bwd(num_heads, interpret, base2, res, g):
    q, k, v, bias_k, bias_v, key_valid = res
    _, vjp = jax.vjp(lambda *a: _xla_impl(*a, num_heads, base2=base2),
                     q, k, v, bias_k, bias_v, key_valid)
    dq, dk, dv, dbk, dbv, _ = vjp(g)
    return dq, dk, dv, dbk, dbv, None


_residue_attention_pallas.defvjp(_ra_fwd, _ra_bwd)


def residue_attention(q, k, v, bias_k, bias_v, key_valid=None, *, num_heads: int,
                      force_xla: bool = False, force_pallas: bool = False,
                      base2: bool = False):
    """Residue attention in (B, T, L, C) layout: attends over L, batch (B, T).

    q pre-scaled by head_dim**-0.5 and projected; k, v projected; bias_k /
    bias_v (1, 1, C) or (C,); key_valid (B, T, L) with 1 = attendable (the
    bias token is always attendable). Returns (B, T, L, C) pre-out-proj.
    ``base2``: q additionally carries LOG2E and softmax runs via exp2 with a
    static overflow cap (the fold contract, ops/time_attention docstring).
    """
    import os

    from ..parallel.kernel_sharding import get_kernel_mesh, shard_map_batch0

    B, T, L, C = q.shape
    if key_valid is None:
        key_valid = jnp.ones((B, T, L), jnp.float32)
    env = os.environ.get("MDGEN_RESIDUE_ATTENTION", "")  # "xla" | "pallas" A/B override
    force_xla = force_xla or env == "xla"
    force_pallas = force_pallas or env == "pallas"
    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu
    mesh = get_kernel_mesh()
    multi = jax.device_count() > 1 or mesh is not None
    # per-DEVICE rows is what the backend compiler sees: very large fused
    # graphs around the kernel crash it at B*T >~ 12k rows (observed at
    # B=128, T=100, r2), so gate on the local shard's row count
    local_B = B // mesh.devices.size if mesh is not None and B % mesh.devices.size == 0 else B
    use_pallas = force_pallas or (
        not force_xla and on_tpu and L <= MAX_L and local_B * T <= 8192
    )
    if use_pallas:
        def local(q, k, v, bk, bv, key_valid):
            return _residue_attention_pallas(q, k, v, bk, bv, key_valid,
                                             num_heads, interp, base2)

        if multi:
            out = shard_map_batch0(local, (True, True, True, False, False, True),
                                   q, k, v, bias_k, bias_v, key_valid)
            if out is not None:
                return out
            if not force_pallas:
                return _xla_impl(q, k, v, bias_k, bias_v, key_valid, num_heads,
                                 base2=base2)
        return local(q, k, v, bias_k, bias_v, key_valid)
    if not force_xla and on_tpu and C % 128 == 0 and _blocked_fits(L, C):
        # large L (ATLAS crop-256): residue attention is time attention with
        # the axes swapped (attend over L, batch (B, T)); the blocked
        # grouped-stack kernel avoids the XLA path's (B*T, H, L, L) f32
        # logits in HBM. key_valid (B, T, L) is already in the time kernel's
        # (B, batch, attend) convention, and its XLA-composition backward is
        # exactly this stage's backward under the same swap.
        swap = lambda x: x.transpose(0, 2, 1, 3)

        def local_blocked(q, k, v, bk, bv, key_valid):
            out = _time_attention_pallas_blocked(
                swap(q), swap(k), swap(v), bk, bv, key_valid, num_heads, interp,
                base2
            )
            return swap(out)

        if multi:
            out = shard_map_batch0(local_blocked, (True, True, True, False, False, True),
                                   q, k, v, bias_k, bias_v, key_valid)
            if out is not None:
                return out
            return _xla_impl(q, k, v, bias_k, bias_v, key_valid, num_heads,
                             base2=base2)
        return local_blocked(q, k, v, bias_k, bias_v, key_valid)
    return _xla_impl(q, k, v, bias_k, bias_v, key_valid, num_heads, base2=base2)
