"""Fully fused LatentMDGenLayer: one Pallas kernel per (layer, batch element).

The reference hot loop (src/mdgen/model/latent_model.py:456-493) is
residue-attention -> frame-attention -> MLP, each wrapped in AdaLN
modulate/gate with non-affine LayerNorms. At small L this entire layer fits
in VMEM per batch element (weights ~4.7 MB bf16 + a (Tp, L*C) activation
~0.3 MB), so the kernel runs the whole layer reading and writing the
activation exactly once: per residue slice — LN + modulate + one (C -> 3C)
qkv matmul + RoPE; pair-loop residue attention (ops/residue_attention.py
math); grouped-stack frame attention (ops/time_attention.py math); the
erf-GELU MLP — with every intermediate in registers/VMEM. No projection,
logit, or LN intermediate ever touches HBM.

Backward: custom VJP whose backward is the VJP of the XLA composition of the
same math (numerically the flax layer path).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .adaln_mlp import _erf
from .adaln_mlp import _xla_impl as _mlp_xla
from .residue_attention import _tables_np as _res_tables_np
from .residue_attention import _xla_impl as _res_xla
from .time_attention import MAX_L, MAX_T, _block_xla, _grouped_attend
from .time_attention import _rope_tables_np as _time_tables_np

_NEG_INF = -1e9
_LN_EPS = 1e-6


def _kernel(x_ref, mod_ref, wqkv_l_ref, bqkv_l_ref, wout_l_ref, bout_l_ref,
            wqkv_t_ref, bqkv_t_ref, wout_t_ref, bout_t_ref,
            w1_ref, b1_ref, w2_ref, b2_ref,
            bkl_ref, bvl_ref, bkt_ref, bvt_ref,
            bias_l_ref, bias_t_ref,
            cosr_ref, sinr_ref, cost_ref, sint_ref, fh_ref, s_ref, st_ref,
            o_ref, *, num_heads: int, head_dim: int, channels: int):
    C, H, D = channels, num_heads, head_dim
    Tp = x_ref.shape[1]
    LC = x_ref.shape[2]
    L = LC // C
    J = L + 1
    half = D // 2
    dt = x_ref.dtype

    fh = fh_ref[...]  # (1, C)
    S = s_ref[...]
    St = st_ref[...]

    def rotate_half(x32):
        take_right = pltpu.roll(x32, C - half, 1)
        take_left = pltpu.roll(x32, half, 1)
        return -take_right * fh + take_left * (1 - fh)

    def rope_res(x, pos):
        cos = cosr_ref[pos].astype(jnp.float32)  # (1, C)
        sin = sinr_ref[pos].astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        return (x32 * cos + rotate_half(x32) * sin).astype(x.dtype)

    def rope_t(x, n0, n):
        cos = cost_ref[pl.ds(n0, n)].astype(jnp.float32)
        sin = sint_ref[pl.ds(n0, n)].astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        return (x32 * cos + rotate_half(x32) * sin).astype(x.dtype)

    def modln(xr, j):
        # LN (f32 lane stats, eps 1e-6) + AdaLN modulate with mod row j
        x32 = xr.astype(jnp.float32)
        mean = jnp.mean(x32, axis=1, keepdims=True)
        var = jnp.mean(x32 * x32, axis=1, keepdims=True) - mean * mean
        h = (x32 - mean) * jax.lax.rsqrt(var + _LN_EPS)
        sh = mod_ref[0, j:j + 1, :].astype(jnp.float32)
        sc = mod_ref[0, j + 1:j + 2, :].astype(jnp.float32)
        return (h * (1.0 + sc) + sh).astype(dt)

    def gatev(j):
        return mod_ref[0, j:j + 1, :].astype(jnp.float32)  # (1, C)

    x = x_ref[0]  # (Tp, LC)

    # ---- stage 1: residue attention over L, rows as batch ----
    qs, ks, vs, xs = [], [], [], []
    for r in range(L):
        xr = x[:, r * C:(r + 1) * C]
        xs.append(xr)
        h = modln(xr, 0)  # sh_l, sc_l
        qkv = (jax.lax.dot_general(
            h, wqkv_l_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + bqkv_l_ref[...].astype(jnp.float32)).astype(dt)
        qs.append(rope_res(qkv[:, :C], r))
        ks.append(rope_res(qkv[:, C:2 * C], r))
        vs.append(qkv[:, 2 * C:])
    ks.append(rope_res(jnp.broadcast_to(bkl_ref[...], (Tp, C)).astype(dt), L))
    vs.append(jnp.broadcast_to(bvl_ref[...], (Tp, C)).astype(dt))

    Sd = S.astype(dt)
    bias_l = bias_l_ref[0]  # (Tp, J)
    g_l = gatev(2)
    x1 = []
    for i in range(L):
        ls = []
        for j in range(J):
            e = qs[i] * ks[j]
            l = jax.lax.dot_general(
                e, Sd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            ls.append(l + bias_l[:, j:j + 1])
        m = ls[0]
        for l in ls[1:]:
            m = jnp.maximum(m, l)
        ps = [jnp.exp(l - m) for l in ls]
        denom = ps[0]
        for p in ps[1:]:
            denom = denom + p
        inv = 1.0 / denom
        acc = jnp.zeros((Tp, C), jnp.float32)
        for j in range(J):
            p_exp = jax.lax.dot_general(
                ps[j] * inv, St, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            acc = acc + p_exp * vs[j].astype(jnp.float32)
        y = jax.lax.dot_general(
            acc.astype(dt), wout_l_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bout_l_ref[...].astype(jnp.float32)
        x1.append((xs[i].astype(jnp.float32) + g_l * y).astype(dt))

    # ---- stage 2: frame attention over Tp, residues independent ----
    bk_blk = rope_t(jnp.broadcast_to(bkt_ref[...], (8, C)).astype(dt), Tp, 8)
    bv_blk = jnp.broadcast_to(bvt_ref[...], (8, C)).astype(dt)
    g_t = gatev(5)
    x2 = []
    for r in range(L):
        h = modln(x1[r], 3)  # sh_t, sc_t
        qkv = (jax.lax.dot_general(
            h, wqkv_t_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + bqkv_t_ref[...].astype(jnp.float32)).astype(dt)
        q_r = rope_t(qkv[:, :C], 0, Tp)
        k_r = rope_t(qkv[:, C:2 * C], 0, Tp)
        kb_r = jnp.concatenate([k_r, bk_blk], axis=0)
        vb_r = jnp.concatenate([qkv[:, 2 * C:], bv_blk], axis=0)
        att = _grouped_attend(q_r, kb_r.T, vb_r, bias_t_ref[0, r:r + 1, :], H, D)
        y = jax.lax.dot_general(
            att.astype(dt), wout_t_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bout_t_ref[...].astype(jnp.float32)
        x2.append((x1[r].astype(jnp.float32) + g_t * y).astype(dt))

    # ---- stage 3: MLP ----
    g_m = gatev(8)
    for r in range(L):
        h = modln(x2[r], 6)  # sh_m, sc_m
        a = jax.lax.dot_general(
            h, w1_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + b1_ref[...].astype(jnp.float32)
        a = a * 0.5 * (1.0 + _erf(a * (2.0**-0.5)))
        y = jax.lax.dot_general(
            a.astype(dt), w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[...].astype(jnp.float32)
        o_ref[0, :, r * C:(r + 1) * C] = (x2[r].astype(jnp.float32) + g_m * y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "T", "L", "interpret"))
def _pallas_fwd(x, mod, wqkv_l, bqkv_l, wout_l, bout_l, wqkv_t, bqkv_t, wout_t, bout_t,
                w1, b1, w2, b2, bkl, bvl, bkt, bvt, mask,
                num_heads: int, T: int, L: int, interpret: bool = False):
    B, N, C = x.shape
    D = C // num_heads
    F = w1.shape[1]
    J = L + 1
    Tp = -(-T // 8) * 8
    TKt = Tp + 8

    x = x.reshape(B, T, L * C)
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))

    # residue-attention additive bias (B, Tp, J): mask (B, T, L) keys + the
    # always-attendable bias token
    bias_l = (mask.astype(jnp.float32) - 1.0) * -_NEG_INF  # (B, T, L)
    bias_l = jnp.concatenate([bias_l, jnp.zeros((B, T, 1), jnp.float32)], axis=2)
    if Tp != T:
        bias_l = jnp.pad(bias_l, ((0, 0), (0, Tp - T), (0, 0)))
    # frame-attention additive bias (B, L, TKt)
    kv_t = mask.transpose(0, 2, 1)  # (B, L, T)
    bias_t = (kv_t.astype(jnp.float32) - 1.0) * -_NEG_INF
    tail = jnp.full((B, L, TKt - T), _NEG_INF, jnp.float32)
    tail = tail.at[:, :, Tp - T].set(0.0)
    bias_t = jnp.concatenate([bias_t, tail], axis=2)

    cosr_np, sinr_np, fh_np, s_np = _res_tables_np(J, D, C)
    cost_np, sint_np, _ = _time_tables_np(T + 1, D, C)

    def ttable(base):
        ext_q = base[list(range(T)) + [T - 1] * (Tp - T)] if Tp != T else base[:T]
        return np.concatenate([ext_q, np.tile(base[T:T + 1], (8, 1))], axis=0)

    cosr = jnp.asarray(cosr_np, jnp.float32).reshape(J, 1, C)
    sinr = jnp.asarray(sinr_np, jnp.float32).reshape(J, 1, C)
    cost = jnp.asarray(ttable(cost_np), jnp.float32)
    sint = jnp.asarray(ttable(sint_np), jnp.float32)
    fh = jnp.asarray(fh_np, jnp.float32).reshape(1, C)
    S = jnp.asarray(s_np, jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, head_dim=D, channels=C),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Tp, L * C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 9, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((C, 3 * C), lambda b: (0, 0)),
            pl.BlockSpec((1, 3 * C), lambda b: (0, 0)),
            pl.BlockSpec((C, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((C, 3 * C), lambda b: (0, 0)),
            pl.BlockSpec((1, 3 * C), lambda b: (0, 0)),
            pl.BlockSpec((C, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((C, F), lambda b: (0, 0)),
            pl.BlockSpec((1, F), lambda b: (0, 0)),
            pl.BlockSpec((F, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((1, Tp, J), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, L, TKt), lambda b: (b, 0, 0)),
            pl.BlockSpec((J, 1, C), lambda b: (0, 0, 0)),
            pl.BlockSpec((J, 1, C), lambda b: (0, 0, 0)),
            pl.BlockSpec((TKt, C), lambda b: (0, 0)),
            pl.BlockSpec((TKt, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((C, num_heads), lambda b: (0, 0)),
            pl.BlockSpec((num_heads, C), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Tp, L * C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Tp, L * C), x.dtype),
        interpret=interpret,
    )(x, mod.reshape(B, 9, C),
      wqkv_l, bqkv_l.reshape(1, 3 * C), wout_l, bout_l.reshape(1, C),
      wqkv_t, bqkv_t.reshape(1, 3 * C), wout_t, bout_t.reshape(1, C),
      w1, b1.reshape(1, F), w2, b2.reshape(1, C),
      bkl.reshape(1, C).astype(x.dtype), bvl.reshape(1, C).astype(x.dtype),
      bkt.reshape(1, C).astype(x.dtype), bvt.reshape(1, C).astype(x.dtype),
      bias_l, bias_t, cosr, sinr, cost, sint, fh, S, S.T)
    return out[:, :T].reshape(B, T * L, C)


def _layer_xla(x, mod, wqkv_l, bqkv_l, wout_l, bout_l, wqkv_t, bqkv_t, wout_t, bout_t,
               w1, b1, w2, b2, bkl, bvl, bkt, bvt, mask, num_heads, T, L):
    """XLA composition of the whole layer (CPU path and VJP backward) —
    numerically the flax LatentMDGenLayer path."""
    B, N, C = x.shape
    modr = mod.reshape(B, 9, C)
    sh_l, sc_l, g_l = modr[:, 0], modr[:, 1], modr[:, 2]
    sh_t, sc_t, g_t = modr[:, 3], modr[:, 4], modr[:, 5]
    sh_m, sc_m, g_m = modr[:, 6], modr[:, 7], modr[:, 8]

    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    h = ((x32 - mean) * jax.lax.rsqrt(var + _LN_EPS)).astype(x.dtype)
    h = h * (1 + sc_l[:, None]) + sh_l[:, None]
    qkv = h @ wqkv_l.astype(h.dtype) + bqkv_l.astype(h.dtype)
    q, k, v = (a.reshape(B, T, L, C) for a in
               (qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]))
    out = _res_xla(q, k, v, bkl, bvl, mask, num_heads)
    y = out.reshape(B, N, C) @ wout_l.astype(x.dtype) + bout_l.astype(x.dtype)
    x = x + g_l[:, None] * y

    x = _block_xla(x, sh_t, sc_t, g_t, wqkv_t, bqkv_t, wout_t, bout_t, bkt, bvt,
                   mask.transpose(0, 2, 1), num_heads, T, L)

    return _mlp_xla(x, sh_m, sc_m, g_m, w1, b1, w2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(19, 20, 21))
def _fused_layer_pallas(x, mod, wqkv_l, bqkv_l, wout_l, bout_l, wqkv_t, bqkv_t,
                        wout_t, bout_t, w1, b1, w2, b2, bkl, bvl, bkt, bvt, mask,
                        num_heads, T, L):
    return _pallas_fwd(x, mod, wqkv_l, bqkv_l, wout_l, bout_l, wqkv_t, bqkv_t,
                       wout_t, bout_t, w1, b1, w2, b2, bkl, bvl, bkt, bvt, mask,
                       num_heads, T, L)


def _fl_fwd(x, mod, wqkv_l, bqkv_l, wout_l, bout_l, wqkv_t, bqkv_t, wout_t, bout_t,
            w1, b1, w2, b2, bkl, bvl, bkt, bvt, mask, num_heads, T, L):
    res = (x, mod, wqkv_l, bqkv_l, wout_l, bout_l, wqkv_t, bqkv_t, wout_t, bout_t,
           w1, b1, w2, b2, bkl, bvl, bkt, bvt, mask)
    return _pallas_fwd(*res, num_heads, T, L), res


def _fl_bwd(num_heads, T, L, res, grad):
    _, vjp = jax.vjp(lambda *a: _layer_xla(*a, num_heads, T, L), *res)
    grads = vjp(grad)
    return grads[:18] + (None,)


_fused_layer_pallas.defvjp(_fl_fwd, _fl_bwd)


def fused_layer(x, mod, wqkv_l, bqkv_l, wout_l, bout_l, wqkv_t, bqkv_t, wout_t,
                bout_t, w1, b1, w2, b2, bkl, bvl, bkt, bvt, mask, *,
                num_heads: int, tl: tuple, force_xla: bool = False,
                force_pallas: bool = False):
    """The whole LatentMDGenLayer as one op. x (B, T*L, C) raw; mod (B, 9C)
    AdaLN output (pre-split); wqkv_* (C, 3C) with the query scale folded into
    the q columns; mask (B, T, L) with 1 = valid."""
    import os

    T, L = tl
    B, N, C = x.shape
    env = os.environ.get("MDGEN_FUSED_LAYER", "")
    force_xla = force_xla or env == "xla"
    force_pallas = force_pallas or env == "pallas"
    use_pallas = force_pallas or (
        not force_xla and jax.default_backend() == "tpu" and C % 128 == 0
        and L <= MAX_L and T <= MAX_T and jax.device_count() == 1
    )
    if use_pallas:
        return _fused_layer_pallas(x, mod, wqkv_l, bqkv_l, wout_l, bout_l,
                                   wqkv_t, bqkv_t, wout_t, bout_t, w1, b1, w2, b2,
                                   bkl, bvl, bkt, bvt, mask, num_heads, T, L)
    return _layer_xla(x, mod, wqkv_l, bqkv_l, wout_l, bout_l, wqkv_t, bqkv_t,
                      wout_t, bout_t, w1, b1, w2, b2, bkl, bvl, bkt, bvt, mask,
                      num_heads, T, L)
