"""Fused AdaLN-modulate Pallas kernel: LN(x) * (1 + scale) + shift in one pass.

Each denoiser block applies three non-affine LayerNorm + modulate pairs
(src/mdgen/model/latent_model.py:459-491); under XLA these lower to separate
convert/reduce fusions plus elementwise passes over the full (B, T, L, C)
activation (~1.3 ms/forward of `convert_reduce_fusion` at the 4AA bench
shape, see PERF.md). This kernel reads x once, computes f32 row statistics in
VMEM, and writes the modulated output once; the custom VJP fuses the LN
backward with the modulate backward the same way.

x is processed as (B, R, C) rows (R = T*L); shift/scale are per-batch (B, C)
as AdaLN produces them. Falls back to the XLA composition off-TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_EPS = 1e-6


# ---------------------------------------------------------------------------
def _fwd_kernel(x_ref, shift_ref, scale_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)  # (BR, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    xhat = (x - mean) * jax.lax.rsqrt(var + _EPS)
    out = xhat * (1.0 + scale_ref[0].astype(jnp.float32)) + shift_ref[0].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _bwd_kernel(x_ref, shift_ref, scale_ref, dy_ref, dx_ref, dshift_ref, dscale_ref):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dshift_ref[0] = jnp.zeros_like(dshift_ref[0])
        dscale_ref[0] = jnp.zeros_like(dscale_ref[0])

    x = x_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    scale = scale_ref[0].astype(jnp.float32)

    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _EPS)
    xhat = (x - mean) * inv

    dshift_ref[0] += jnp.sum(dy, axis=0, keepdims=True)
    dscale_ref[0] += jnp.sum(dy * xhat, axis=0, keepdims=True)

    g = dy * (1.0 + scale)  # dL/dxhat
    gm = jnp.mean(g, axis=-1, keepdims=True)
    gx = jnp.mean(g * xhat, axis=-1, keepdims=True)
    dx = inv * (g - gm - xhat * gx)
    dx_ref[0] = dx.astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("block_r",))
def _fwd_tpu(x, shift, scale, block_r: int = 1024):
    B, R, C = x.shape
    br = min(block_r, R)
    n_r = pl.cdiv(R, br)
    pad = n_r * br - R
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(B, n_r),
        in_specs=[
            pl.BlockSpec((1, br, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, br, C), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_r * br, C), x.dtype),
    )(x, shift[:, None, :], scale[:, None, :])
    return out[:, :R] if pad else out


@functools.partial(jax.jit, static_argnames=("block_r",))
def _bwd_tpu(x, shift, scale, dy, block_r: int = 1024):
    B, R, C = x.shape
    br = min(block_r, R)
    n_r = pl.cdiv(R, br)
    pad = n_r * br - R
    if pad:
        p3 = ((0, 0), (0, pad), (0, 0))
        x, dy = jnp.pad(x, p3), jnp.pad(dy, p3)
    dx, dshift, dscale = pl.pallas_call(
        _bwd_kernel,
        grid=(B, n_r),
        in_specs=[
            pl.BlockSpec((1, br, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, br, C), lambda b, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, br, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),  # revisited: accumulates over i
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_r * br, C), x.dtype),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ],
    )(x, shift[:, None, :], scale[:, None, :], dy)
    if pad:
        dx = dx[:, :R]
    return dx, dshift[:, 0], dscale[:, 0]


# ---------------------------------------------------------------------------
@jax.custom_vjp
def _adaln_pallas(x, shift, scale):
    return _fwd_tpu(x, shift, scale)


def _adaln_fwd(x, shift, scale):
    return _fwd_tpu(x, shift, scale), (x, shift, scale)


def _adaln_bwd(res, dy):
    x, shift, scale = res
    dx, dshift, dscale = _bwd_tpu(x, shift, scale, dy)
    return dx, dshift.astype(shift.dtype), dscale.astype(scale.dtype)


_adaln_pallas.defvjp(_adaln_fwd, _adaln_bwd)


def _adaln_xla(x, shift, scale):
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    var = jnp.mean((x.astype(jnp.float32) - mean) ** 2, axis=-1, keepdims=True)
    xhat = ((x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + _EPS)).astype(x.dtype)
    expand = (slice(None),) + (None,) * (x.ndim - 2)
    return xhat * (1 + scale[expand]) + shift[expand]


def adaln_modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """modulate(LayerNorm(x), shift, scale) with shift/scale (B, C); x (B, ..., C)."""
    if jax.default_backend() != "tpu":
        return _adaln_xla(x, shift, scale)
    orig_shape = x.shape
    B, C = x.shape[0], x.shape[-1]
    xr = x.reshape(B, -1, C)
    out = _adaln_pallas(xr, shift.astype(x.dtype), scale.astype(x.dtype))
    return out.reshape(orig_shape)
