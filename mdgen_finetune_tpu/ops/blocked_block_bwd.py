"""Hand-fused Pallas backward for the blocked whole-block kernels.

The large-L / long-T fused attention blocks (`ops/time_attention.py`
`_block_pallas_fwd_blocked` — frame attention, grid (B, L) — and
`_block_pallas_fwd_blocked_rows` — residue attention, grid (B, T)) carried
XLA-composition backwards through round 3: at the ATLAS crop-256 shape that
spills the full rope/logit surfaces to HBM and costs ~230 ms of the 292 ms
train step (r4 device profile, PERF.md). This module is the
`ops/fused_layer_bwd.py` treatment applied to the blocked grid: one program
per (batch element, residue|frame) that

- RECOMPUTES the block's forward (LN + modulate + qkv + rope + grouped-stack
  attention with the base-2 no-max softmax + out-projection) from the saved
  block input — value-identical op order to `_block_kernel_blocked`;
- computes the dx block and the per-batch-element AdaLN-row grads (dsh, dsc,
  dg accumulate over the inner grid axis, whose out blocks are b-indexed and
  therefore VMEM-resident across consecutive programs); and
- ACCUMULATES the weight grads in f32 across the whole sequential grid
  (program (0, 0) initialises; the TPU grid is sequential per core, so the
  running sum is race-free).

Gradient math: the unnormalized-softmax adjoint. With u = p @ vb,
denom = sum(p32) + eps, pv = u / denom:
  dpv  = masks-stacked dout slice
  du   = dpv / denom;          dvb = p^T @ du
  dp   = du @ vb^T;            ddenom = -(1/denom) * rowsum(dpv * pv)
  dlogits = LN2 * p32 * (dp + ddenom)
which equals the normalized form LN2 * pn * (dpn - rowsum(pn*dpn)) used by
fused_layer_bwd (derivation in the r4 log). RoPE transpose and LN/modulate
adjoints are shared with fused_layer_bwd.

Reference stage being differentiated: the factorized attention of
src/mdgen/model/latent_model.py:466-486 wrapped in its AdaLN gate.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_layer_bwd import _acc, _modln_bwd, _rot_t
from .time_attention import LN2 as _LN2
from .time_attention import _group_masks, _rope_tables_np

_NEG_INF = -1e9
_LN_EPS = 1e-6


def _bwd_kernel(x_ref, do_ref, sh_ref, sc_ref, g_ref, wqkv_ref, bqkv_ref,
                wout_ref, bout_ref, bk_ref, bv_ref, bias_ref, cos_ref, sin_ref,
                fh_ref,
                dx_ref, dsh_ref, dsc_ref, dg_ref, dwqkv_ref, dbqkv_ref,
                dwout_ref, dbout_ref, dbk_ref, dbv_ref, *,
                num_heads: int, head_dim: int, kq: int, pad_dim: int = 0):
    H, D = num_heads, head_dim
    rank4 = len(x_ref.shape) == 4
    Tp2, C = x_ref.shape[-2], x_ref.shape[-1]
    half = D // 2
    Dp = pad_dim or D
    Cp = H * Dp
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    first_r = pl.program_id(1) == 0

    fh = fh_ref[...]
    sh = sh_ref[0].astype(jnp.float32)
    sc = sc_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    wqkv = wqkv_ref[...]
    bqkv = bqkv_ref[...].astype(jnp.float32)
    wout = wout_ref[...]
    bout = bout_ref[...].astype(jnp.float32)

    def rotate_half(x32):
        take_right = pltpu.roll(x32, Cp - half, 1)
        take_left = pltpu.roll(x32, half, 1)
        return -take_right * fh + take_left * (1 - fh)

    def rope(x, n0, n):
        cos = cos_ref[pl.ds(n0, n)].astype(jnp.float32)
        sin = sin_ref[pl.ds(n0, n)].astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        return (x32 * cos + rotate_half(x32) * sin).astype(x.dtype)

    def rope_t(dy, n0, n):
        cos = cos_ref[pl.ds(n0, n)].astype(jnp.float32)
        sin = sin_ref[pl.ds(n0, n)].astype(jnp.float32)
        return dy * cos + _rot_t(dy * sin, fh, half, Cp)

    # ---- recompute forward (op order of _block_kernel_blocked) ----
    x = x_ref[0, 0] if rank4 else x_ref[0]  # (Tp2, C)
    dt = x.dtype
    dO = (do_ref[0, 0] if rank4 else do_ref[0]).astype(jnp.float32)

    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=1, keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(var + _LN_EPS)
    h_hat = (x32 - mean) * rstd
    h = (h_hat * (1.0 + sc) + sh).astype(dt)
    qkv = (jax.lax.dot_general(
        h, wqkv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + bqkv).astype(dt)  # (Tp2, 3Cp)

    bk_blk = rope(jnp.broadcast_to(bk_ref[...], (8, Cp)).astype(dt), kq, 8)
    bv_blk = jnp.broadcast_to(bv_ref[...], (8, Cp)).astype(dt)
    q_all = rope(qkv[:, :Cp], 0, Tp2)
    kb = jnp.concatenate([rope(qkv[0:kq, Cp:2 * Cp], 0, kq), bk_blk], axis=0)
    vb = jnp.concatenate([qkv[0:kq, 2 * Cp:], bv_blk], axis=0)
    bias = bias_ref[0]  # (1, TK)
    TK = kb.shape[0]

    Gh = max(1, 128 // Dp)
    while Gh > 1 and H % Gh:
        Gh -= 1

    # forward attend (saving per-group intermediates) — mirrors
    # _grouped_attend(base2=True): no-max exp2 with static cap, deferred
    # divide, epsilon-guarded denominator
    outs, saved = [], []
    h0 = 0
    while h0 < H:
        gh = min(Gh, H - h0)
        W = gh * Dp
        lo = h0 * Dp
        q_rg = q_all[:, lo:lo + W]
        kb_rg = kb[:, lo:lo + W]
        vb_rg = vb[:, lo:lo + W]
        masks = _group_masks(Dp, gh, q_rg.dtype)
        qs = (q_rg[None] * masks).reshape(gh * Tp2, W)
        logits = jax.lax.dot_general(
            qs, kb_rg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + bias.astype(jnp.float32)
        p32 = jnp.exp2(jnp.minimum(logits, 100.0))
        p = p32.astype(dt)
        inv = 1.0 / (jnp.sum(p32, axis=1, keepdims=True) + 1e-30)
        pv = jax.lax.dot_general(
            p, vb_rg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * inv  # (gh*Tp2, W)
        outs.append(jnp.sum(pv.reshape(gh, Tp2, W) * masks.astype(jnp.float32), axis=0))
        saved.append((qs, p, p32, inv, pv, kb_rg, vb_rg, masks, gh, W, lo))
        h0 += gh
    att = jnp.concatenate(outs, axis=1).astype(dt)  # (Tp2, Cp)
    y = jax.lax.dot_general(
        att, wout, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bout  # (Tp2, C)

    # ---- backward ----
    dg_row = jnp.sum(dO * y, axis=0, keepdims=True)  # (1, C)
    dpre = (dO * g).astype(dt)  # (Tp2, C)
    _acc(dwout_ref, jax.lax.dot_general(
        att, dpre, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32), first)
    _acc(dbout_ref, jnp.sum(dpre.astype(jnp.float32), axis=0, keepdims=True), first)
    datt = jax.lax.dot_general(
        dpre, wout, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)  # (Tp2, Cp)

    dq_parts, dkb_parts, dvb_parts = [], [], []
    for (qs, p, p32, inv, pv, kb_rg, vb_rg, masks, gh, W, lo) in saved:
        dout_g = datt[:, lo:lo + W]
        dpv = (dout_g[None] * masks).reshape(gh * Tp2, W)  # bf16
        du = (dpv.astype(jnp.float32) * inv).astype(dt)
        dvb_g = jax.lax.dot_general(
            p, du, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (TK, W)
        dp = jax.lax.dot_general(
            du, vb_rg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (gh*Tp2, TK)
        ddenom = -jnp.sum(dpv.astype(jnp.float32) * pv, axis=1, keepdims=True) * inv
        dlog = (_LN2 * p32 * (dp + ddenom)).astype(dt)
        dqs = jax.lax.dot_general(
            dlog, kb_rg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (gh*Tp2, W)
        dq_g = jnp.sum(dqs.reshape(gh, Tp2, W) * masks.astype(jnp.float32), axis=0)
        dkb_g = jax.lax.dot_general(
            dlog, qs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (TK, W)
        dq_parts.append(dq_g)
        dkb_parts.append(dkb_g)
        dvb_parts.append(dvb_g)
    dq_roped = jnp.concatenate(dq_parts, axis=1)  # (Tp2, Cp) f32
    dkb = jnp.concatenate(dkb_parts, axis=1)      # (TK, Cp)
    dvb = jnp.concatenate(dvb_parts, axis=1)

    dq = rope_t(dq_roped, 0, Tp2)
    dk = rope_t(dkb[:kq], 0, kq)
    dbk = jnp.sum(rope_t(dkb[kq:TK], kq, TK - kq), axis=0, keepdims=True)
    dbv = jnp.sum(dvb[kq:TK], axis=0, keepdims=True)
    _acc(dbk_ref, dbk, first)
    _acc(dbv_ref, dbv, first)

    if Tp2 > kq:
        zpad = jnp.zeros((Tp2 - kq, Cp), jnp.float32)
        dk_full = jnp.concatenate([dk, zpad], axis=0)
        dv_full = jnp.concatenate([dvb[:kq], zpad], axis=0)
    else:
        dk_full, dv_full = dk, dvb[:kq]
    dqkv = jnp.concatenate([dq, dk_full, dv_full], axis=1).astype(dt)
    _acc(dwqkv_ref, jax.lax.dot_general(
        h, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32), first)
    _acc(dbqkv_ref, jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True), first)
    dh = jax.lax.dot_general(
        dqkv, wqkv, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (Tp2, C)

    dx_ln, dsh_row, dsc_row = _modln_bwd(dh, h_hat, rstd, sc)
    _acc(dsh_ref, dsh_row.reshape(1, 1, C), first_r)
    _acc(dsc_ref, dsc_row.reshape(1, 1, C), first_r)
    _acc(dg_ref, dg_row.reshape(1, 1, C), first_r)
    dx = (dO + dx_ln).astype(dx_ref.dtype)
    if rank4:
        dx_ref[0, 0] = dx
    else:
        dx_ref[0] = dx


def _prep_weights(wqkv, bqkv, wout, bias_k, bias_v, C, H, D, Dp):
    if Dp != D:
        wqkv_p = jnp.pad(wqkv.reshape(C, 3, H, D),
                         ((0, 0), (0, 0), (0, 0), (0, Dp - D))).reshape(C, 3 * H * Dp)
        bqkv_p = jnp.pad(bqkv.reshape(3, H, D),
                         ((0, 0), (0, 0), (0, Dp - D))).reshape(3 * H * Dp)
        wout_p = jnp.pad(wout.reshape(H, D, C),
                         ((0, 0), (0, Dp - D), (0, 0))).reshape(H * Dp, C)
        bk_p = jnp.pad(bias_k.reshape(H, D), ((0, 0), (0, Dp - D))).reshape(1, H * Dp)
        bv_p = jnp.pad(bias_v.reshape(H, D), ((0, 0), (0, Dp - D))).reshape(1, H * Dp)
    else:
        wqkv_p, bqkv_p, wout_p = wqkv, bqkv, wout
        bk_p = bias_k.reshape(1, C)
        bv_p = bias_v.reshape(1, C)
    return wqkv_p, bqkv_p, wout_p, bk_p, bv_p


def _unpad_grads(dwqkv_p, dbqkv_p, dwout_p, dbk_p, dbv_p, C, H, D, Dp):
    if Dp == D:
        return dwqkv_p, dbqkv_p.reshape(-1), dwout_p, dbk_p, dbv_p

    def sl(a, parts, axis):
        a = a.reshape(parts)
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(0, D)
        return a[tuple(idx)]

    return (sl(dwqkv_p, (C, 3, H, Dp), 3).reshape(C, 3 * C),
            sl(dbqkv_p.reshape(-1), (3, H, Dp), 2).reshape(-1),
            sl(dwout_p, (H, Dp, C), 1).reshape(C, C),
            sl(dbk_p.reshape(-1), (H, Dp), 1).reshape(1, C),
            sl(dbv_p.reshape(-1), (H, Dp), 1).reshape(1, C))


def _bwd_specs(B, C, Cp, TK, tab_rows, inner):
    """The shared (sh, sc, g, weights, bias-tables) in_specs tail and the
    gradient out_specs/out_shapes. ``inner``: the inner grid extent — the
    bias rides flattened as (B*inner, 1, TK) (the forward's layout; a
    (B, inner, TK) block (1, 1, TK) violates the TPU second-to-last-dim
    tiling rule)."""
    in_tail = [
        pl.BlockSpec((1, 1, C), lambda b, r: (b, 0, 0)),
        pl.BlockSpec((1, 1, C), lambda b, r: (b, 0, 0)),
        pl.BlockSpec((1, 1, C), lambda b, r: (b, 0, 0)),
        pl.BlockSpec((C, 3 * Cp), lambda b, r: (0, 0)),
        pl.BlockSpec((1, 3 * Cp), lambda b, r: (0, 0)),
        pl.BlockSpec((Cp, C), lambda b, r: (0, 0)),
        pl.BlockSpec((1, C), lambda b, r: (0, 0)),
        pl.BlockSpec((1, Cp), lambda b, r: (0, 0)),
        pl.BlockSpec((1, Cp), lambda b, r: (0, 0)),
        pl.BlockSpec((1, 1, TK), lambda b, r, _n=inner: (b * _n + r, 0, 0)),
        pl.BlockSpec((tab_rows, Cp), lambda b, r: (0, 0)),
        pl.BlockSpec((tab_rows, Cp), lambda b, r: (0, 0)),
        pl.BlockSpec((1, Cp), lambda b, r: (0, 0)),
    ]
    f32 = jnp.float32
    mods_spec = pl.BlockSpec((1, 1, C), lambda b, r: (b, 0, 0))
    rep = lambda s: pl.BlockSpec(s, lambda b, r: (0,) * len(s))
    out_specs = [mods_spec, mods_spec, mods_spec,
                 rep((C, 3 * Cp)), rep((1, 3 * Cp)), rep((Cp, C)), rep((1, C)),
                 rep((1, Cp)), rep((1, Cp))]
    out_shapes = [jax.ShapeDtypeStruct((B, 1, C), f32)] * 3 + [
        jax.ShapeDtypeStruct((C, 3 * Cp), f32),
        jax.ShapeDtypeStruct((1, 3 * Cp), f32),
        jax.ShapeDtypeStruct((Cp, C), f32),
        jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((1, Cp), f32),
        jax.ShapeDtypeStruct((1, Cp), f32)]
    return in_tail, out_specs, out_shapes


_VMEM = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


@functools.partial(jax.jit, static_argnames=("num_heads", "T", "L", "interpret",
                                             "t_logical"))
def time_block_bwd(x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v,
                   key_valid, grad, num_heads: int, T: int, L: int,
                   interpret: bool = False, t_logical: int = None):
    """Backward of `_block_pallas_fwd_blocked` (frame attention, grid (B, L)).
    Host prep mirrors the forward (same padding/tables/bias contract);
    returns grads for the 10 differentiable args."""
    TL = T if t_logical is None else t_logical
    B, N, C = x.shape
    H = num_heads
    D = C // H
    Tp = -(-T // 8) * 8
    TK = Tp + 8
    import os
    Dp = D if (128 % D == 0 or TK > 512
               or os.environ.get("MDGEN_BLOCKED_COMPACT", "")) else 32
    Cp = H * Dp

    x3 = x.reshape(B, T, L * C)
    g3 = grad.reshape(B, T, L * C)
    if t_logical is not None and TL < T:
        # the XLA twin zero-pads its output past the real frames, so pad-frame
        # cotangents are identically zero
        g3 = g3.at[:, TL:].set(0.0)
    if Tp != T:
        x3 = jnp.pad(x3, ((0, 0), (0, Tp - T), (0, 0)))
        g3 = jnp.pad(g3, ((0, 0), (0, Tp - T), (0, 0)))

    bias = (key_valid.astype(jnp.float32) - 1.0) * -_NEG_INF  # (B, L, T)
    tail = jnp.full((B, L, TK - T), _NEG_INF, jnp.float32)
    tail = tail.at[:, :, Tp - T].set(0.0)
    bias = jnp.concatenate([bias, tail], axis=2).reshape(B * L, 1, TK)

    wqkv_p, bqkv_p, wout_p, bk_p, bv_p = _prep_weights(
        wqkv, bqkv, wout, bias_k, bias_v, C, H, D, Dp)

    cos_np, sin_np, fh_np = _rope_tables_np(max(T, TL) + 1, D, C)
    if Dp != D:
        def lpad(base):
            n = base.shape[0]
            return np.pad(base.reshape(n, H, D),
                          ((0, 0), (0, 0), (0, Dp - D))).reshape(n, Cp)
        cos_np, sin_np = lpad(cos_np), lpad(sin_np)
        fh_np = ((np.arange(Cp) % Dp) < D // 2).astype(np.float32)

    def table(base):
        ext_q = base[list(range(T)) + [T - 1] * (Tp - T)] if Tp != T else base[:T]
        return np.concatenate([ext_q, np.tile(base[TL:TL + 1], (8, 1))], axis=0)

    cos = jnp.asarray(table(cos_np), jnp.float32)
    sin = jnp.asarray(table(sin_np), jnp.float32)
    fh = jnp.asarray(fh_np, jnp.float32).reshape(1, Cp)

    in_tail, out_specs, out_shapes = _bwd_specs(B, C, Cp, TK, TK, L)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=H, head_dim=D, kq=Tp,
                          pad_dim=Dp if Dp != D else 0),
        grid=(B, L),
        in_specs=[pl.BlockSpec((1, Tp, C), lambda b, r: (b, 0, r)),
                  pl.BlockSpec((1, Tp, C), lambda b, r: (b, 0, r))] + in_tail,
        out_specs=[pl.BlockSpec((1, Tp, C), lambda b, r: (b, 0, r))] + out_specs,
        out_shape=[jax.ShapeDtypeStruct((B, Tp, L * C), x.dtype)] + out_shapes,
        interpret=interpret,
        compiler_params=_VMEM,
    )(x3, g3, sh.reshape(B, 1, C), sc.reshape(B, 1, C), g.reshape(B, 1, C),
      wqkv_p, bqkv_p.reshape(1, 3 * Cp), wout_p, bout.reshape(1, C),
      bk_p.astype(x.dtype), bv_p.astype(x.dtype), bias, cos, sin, fh)
    dx, dsh, dsc, dg, dwqkv_p, dbqkv_p, dwout_p, dbout, dbk_p, dbv_p = outs
    dwqkv, dbqkv, dwout, dbk, dbv = _unpad_grads(
        dwqkv_p, dbqkv_p, dwout_p, dbk_p, dbv_p, C, H, D, Dp)
    return (dx[:, :T].reshape(B, N, C).astype(x.dtype),
            dsh.reshape(B, C).astype(sh.dtype),
            dsc.reshape(B, C).astype(sc.dtype),
            dg.reshape(B, C).astype(g.dtype),
            dwqkv.reshape(jnp.shape(wqkv)).astype(wqkv.dtype),
            dbqkv.reshape(jnp.shape(bqkv)).astype(bqkv.dtype),
            dwout.reshape(jnp.shape(wout)).astype(wout.dtype),
            dbout.reshape(jnp.shape(bout)).astype(bout.dtype),
            dbk.reshape(jnp.shape(bias_k)).astype(bias_k.dtype),
            dbv.reshape(jnp.shape(bias_v)).astype(bias_v.dtype))


@functools.partial(jax.jit, static_argnames=("num_heads", "T", "L", "interpret"))
def rows_block_bwd(x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v,
                   key_valid, grad, num_heads: int, T: int, L: int,
                   interpret: bool = False):
    """Backward of `_block_pallas_fwd_blocked_rows` (residue attention, grid
    (B, T), rank-4 blocks in the trunk layout)."""
    B, N, C = x.shape
    H = num_heads
    D = C // H
    Lp = -(-L // 8) * 8
    TK = Lp + 8
    import os
    Dp = D if (128 % D == 0 or TK > 512
               or os.environ.get("MDGEN_BLOCKED_COMPACT", "")) else 32
    Cp = H * Dp

    x4 = x.reshape(B, T, L, C)
    g4 = grad.reshape(B, T, L, C)
    if Lp != L:
        x4 = jnp.pad(x4, ((0, 0), (0, 0), (0, Lp - L), (0, 0)))
        g4 = jnp.pad(g4, ((0, 0), (0, 0), (0, Lp - L), (0, 0)))

    bias = (key_valid.astype(jnp.float32) - 1.0) * -_NEG_INF  # (B, T, L)
    tail = jnp.full((B, T, TK - L), _NEG_INF, jnp.float32)
    tail = tail.at[:, :, Lp - L].set(0.0)
    bias = jnp.concatenate([bias, tail], axis=2).reshape(B * T, 1, TK)

    wqkv_p, bqkv_p, wout_p, bk_p, bv_p = _prep_weights(
        wqkv, bqkv, wout, bias_k, bias_v, C, H, D, Dp)

    cos_np, sin_np, fh_np = _rope_tables_np(L + 1, D, C)
    if Dp != D:
        def lpad(base):
            n = base.shape[0]
            return np.pad(base.reshape(n, H, D),
                          ((0, 0), (0, 0), (0, Dp - D))).reshape(n, Cp)
        cos_np, sin_np = lpad(cos_np), lpad(sin_np)
        fh_np = ((np.arange(Cp) % Dp) < D // 2).astype(np.float32)

    def table(base):
        ext_q = base[list(range(L)) + [L - 1] * (Lp - L)] if Lp != L else base[:L]
        return np.concatenate([ext_q, np.tile(base[L:L + 1], (8, 1))], axis=0)

    cos = jnp.asarray(table(cos_np), jnp.float32)
    sin = jnp.asarray(table(sin_np), jnp.float32)
    fh = jnp.asarray(fh_np, jnp.float32).reshape(1, Cp)

    in_tail, out_specs, out_shapes = _bwd_specs(B, C, Cp, TK, TK, T)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=H, head_dim=D, kq=Lp,
                          pad_dim=Dp if Dp != D else 0),
        grid=(B, T),
        in_specs=[pl.BlockSpec((1, 1, Lp, C), lambda b, t: (b, t, 0, 0)),
                  pl.BlockSpec((1, 1, Lp, C), lambda b, t: (b, t, 0, 0))] + in_tail,
        out_specs=[pl.BlockSpec((1, 1, Lp, C), lambda b, t: (b, t, 0, 0))] + out_specs,
        out_shape=[jax.ShapeDtypeStruct((B, T, Lp, C), x.dtype)] + out_shapes,
        interpret=interpret,
        compiler_params=_VMEM,
    )(x4, g4, sh.reshape(B, 1, C), sc.reshape(B, 1, C), g.reshape(B, 1, C),
      wqkv_p, bqkv_p.reshape(1, 3 * Cp), wout_p, bout.reshape(1, C),
      bk_p.astype(x.dtype), bv_p.astype(x.dtype), bias, cos, sin, fh)
    dx, dsh, dsc, dg, dwqkv_p, dbqkv_p, dwout_p, dbout, dbk_p, dbv_p = outs
    dwqkv, dbqkv, dwout, dbk, dbv = _unpad_grads(
        dwqkv_p, dbqkv_p, dwout_p, dbk_p, dbv_p, C, H, D, Dp)
    return (dx[:, :, :L].reshape(B, N, C).astype(x.dtype),
            dsh.reshape(B, C).astype(sh.dtype),
            dsc.reshape(B, C).astype(sc.dtype),
            dg.reshape(B, C).astype(g.dtype),
            dwqkv.reshape(jnp.shape(wqkv)).astype(wqkv.dtype),
            dbqkv.reshape(jnp.shape(bqkv)).astype(bqkv.dtype),
            dwout.reshape(jnp.shape(wout)).astype(wout.dtype),
            dbout.reshape(jnp.shape(bout)).astype(bout.dtype),
            dbk.reshape(jnp.shape(bias_k)).astype(bias_k.dtype),
            dbv.reshape(jnp.shape(bias_v)).astype(bias_v.dtype))
