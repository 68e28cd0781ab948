"""Fused AdaLN-MLP block: LayerNorm + modulate + MLP + gate + residual.

The reference layer tail (src/mdgen/model/latent_model.py:488-492) is
``x + gate * mlp(modulate(norm3(x), shift, scale))`` with a two-layer
erf-GELU MLP. As separate XLA ops this costs ~0.42 ms/layer at the bench
shape (f32 LN stats pass, modulate pass, fc1 at ~35% MFU, gelu pass, fc2
fused with the next op's LN, gate+residual pass — PERF.md r2). This kernel
runs the whole tail in one VMEM pass per (batch row-block): read x once,
LN stats on lanes in f32, modulate, two MXU matmuls with the weights
resident in VMEM, erf-GELU in f32, gate + residual add, write once.

Backward: custom VJP whose backward is the VJP of the XLA composition
(numerically exact; recomputes the cheap forward pieces).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_EPS = 1e-6


def _erf(z):
    """Abramowitz & Stegun 7.1.26 rational approximation of erf (f32, max
    abs error 1.5e-7 — far below bf16 activation precision). Mosaic has no
    native erf lowering."""
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p = 0.3275911
    s = jnp.sign(z)
    za = jnp.abs(z)
    t = 1.0 / (1.0 + p * za)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-za * za))


def _kernel(x_ref, sh_ref, sc_ref, g_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[0]  # (bn, C) input dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=1, keepdims=True) - mean * mean
    h = (x32 - mean) * jax.lax.rsqrt(var + _EPS)
    h = h * (1.0 + sc_ref[0].astype(jnp.float32)) + sh_ref[0].astype(jnp.float32)
    h = h.astype(x.dtype)
    a = jax.lax.dot_general(
        h, w1_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b1_ref[...].astype(jnp.float32)  # (bn, 4C)
    a = a * 0.5 * (1.0 + _erf(a * (2.0**-0.5)))  # erf-GELU in f32
    y = jax.lax.dot_general(
        a.astype(x.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)  # (bn, C)
    out = x32 + g_ref[0].astype(jnp.float32) * y
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "block_rows"))
def _pallas_fwd(x, sh, sc, g, w1, b1, w2, b2, interpret: bool = False, block_rows: int = 512):
    B, N, C = x.shape
    F = w1.shape[1]

    bn = min(-(-N // 8) * 8, block_rows)
    if N % bn:
        for cand in range(block_rows, 31, -8):
            if N % cand == 0:
                bn = cand
                break
    n_b = pl.cdiv(N, bn)
    pad = n_b * bn - N
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        grid=(B, n_b),
        in_specs=[
            pl.BlockSpec((1, bn, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((C, F), lambda b, i: (0, 0)),
            pl.BlockSpec((1, F), lambda b, i: (0, 0)),
            pl.BlockSpec((F, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bn, C), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_b * bn, C), x.dtype),
        interpret=interpret,
    )(x, sh.reshape(B, 1, C), sc.reshape(B, 1, C), g.reshape(B, 1, C),
      w1, b1.reshape(1, F), w2, b2.reshape(1, C))
    return out[:, :N] if pad else out


# ---------------------------------------------------------------------------
def _xla_impl(x, sh, sc, g, w1, b1, w2, b2):
    """Reference composition (CPU path and VJP backward)."""
    import math

    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    h = ((x32 - mean) * jax.lax.rsqrt(var + _EPS)).astype(x.dtype)
    h = h * (1 + sc[:, None]) + sh[:, None]
    a = h @ w1.astype(h.dtype) + b1.astype(h.dtype)
    a = a * 0.5 * (1.0 + jax.lax.erf(a / math.sqrt(2.0)))
    y = a @ w2.astype(a.dtype) + b2.astype(a.dtype)
    return x + g[:, None] * y


@jax.custom_vjp
def _adaln_mlp_pallas(x, sh, sc, g, w1, b1, w2, b2):
    return _pallas_fwd(x, sh, sc, g, w1, b1, w2, b2)


def _fwd(x, sh, sc, g, w1, b1, w2, b2):
    return _pallas_fwd(x, sh, sc, g, w1, b1, w2, b2), (x, sh, sc, g, w1, b1, w2, b2)


def _bwd(res, grad):
    _, vjp = jax.vjp(_xla_impl, *res)
    return vjp(grad)


_adaln_mlp_pallas.defvjp(_fwd, _bwd)


def adaln_mlp(x, sh, sc, g, w1, b1, w2, b2, *, force_xla: bool = False,
              force_pallas: bool = False):
    """x (B, N, C); sh/sc/g (B, C) AdaLN vectors; w1 (C, F) b1 (F) w2 (F, C)
    b2 (C). Returns x + g * mlp(modulate(LN(x), sh, sc)), x.dtype."""
    import os

    B, N, C = x.shape
    env = os.environ.get("MDGEN_ADALN_MLP", "")
    force_xla = force_xla or env == "xla"
    force_pallas = force_pallas or env == "pallas"
    # Default OFF: measured end-to-end at the bench shape XLA's composition
    # (which fuses the LN stats into the fc2 matmul epilogue) edges out this
    # kernel — 4954 vs 4824 steps/s (PERF.md r2). Kept as a tested building
    # block behind force_pallas / the env override.
    use_pallas = force_pallas and C % 128 == 0
    if use_pallas:
        return _adaln_mlp_pallas(x, sh, sc, g, w1, b1, w2, b2)
    return _xla_impl(x, sh, sc, g, w1, b1, w2, b2)
