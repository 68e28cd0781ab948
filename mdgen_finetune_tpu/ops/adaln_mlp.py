"""Fused AdaLN-MLP block: LayerNorm + modulate + MLP + gate + residual.

The reference layer tail (src/mdgen/model/latent_model.py:488-492) is
``x + gate * mlp(modulate(norm3(x), shift, scale))`` with a two-layer
erf-GELU MLP. As separate XLA ops this costs ~0.42 ms/layer at the bench
shape (f32 LN stats pass, modulate pass, fc1 at ~35% MFU, gelu pass, fc2
fused with the next op's LN, gate+residual pass — PERF.md r2). This kernel
runs the whole tail in one VMEM pass per (batch row-block): read x once,
LN stats on lanes in f32, modulate, two MXU matmuls with the weights
resident in VMEM, erf-GELU in f32, gate + residual add, write once.

Backward: fused Pallas VJP (r5 — one kernel recomputes the forward from the
saved inputs and chains the gradients with f32 weight accumulation over the
sequential grid; MDGEN_ADALN_MLP_BWD=xla restores the XLA-composition VJP).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6


# algebraic-sigmoid erf fit: erf(a / sqrt(2)) ~ t / sqrt(1 + t^2) with
# t = a * P(a^2); the form saturates naturally (no exp / divide / sign
# needed — rsqrt is a hardware op). Reweighted-minimax fit on |a| <= 6,
# degree 4: max |gelu_fast - gelu_erf| = 7.1e-5 in f32 (pinned by
# tests/test_adaln_mlp.py) — ~100x below bf16 activation resolution; the
# degree-6 fit (3.1e-6) costs 2 more FMAs on the (R, 4C) f32 surface for
# accuracy bf16 cannot see.
_GELU_KS = (0.798055917732286, 0.12003597204164997, 0.01547196081666821,
            0.0005614901736225192, 0.00014934348411800474)


def _gelu_fast(a):
    """erf-GELU via the algebraic-sigmoid erf fit above: ~13 cheap VPU ops
    (one rsqrt), no exp / divide / compare — the previous A&S erf chain
    (exp + divide + sign/select) measured
    0.079 ms/layer of the 0.677 ms whole-layer kernel at the bench shape
    (PERF.md r3, the largest single non-matmul cost). |a| > 6 clamps to the
    saturated branch (erf(6/sqrt(2)) = 1 - 2e-9), which also keeps t finite
    for arbitrarily large inputs."""
    # compares run in f32 (Mosaic rejects vector cmpf on bf16); everything
    # else stays in the input dtype so a bf16 surface keeps half traffic
    a32 = a.astype(jnp.float32)
    z = jnp.clip(a32, -6.0, 6.0).astype(a.dtype)
    u = z * z
    p = _GELU_KS[-1]
    for k in _GELU_KS[-2::-1]:
        p = p * u + k
    t = z * p
    # rsqrt must also be f32 (bf16 rsqrt aborts the Mosaic latency table)
    t32 = t.astype(jnp.float32)
    f = (t32 * jax.lax.rsqrt(1.0 + t32 * t32)).astype(a.dtype)
    # the negative saturated branch pins to exactly 0 (a * the ~3e-8 fit
    # residual at the clamp would otherwise grow with |a|)
    return jnp.where(a32 < -6.0, 0.0, a * (0.5 + 0.5 * f))


def _gelu_fast_with_grad(a):
    """(gelu_fast(a), d gelu_fast / da) — the analytic derivative of the
    algebraic form (identical math to XLA autodiff of `_gelu_fast`:
    df/dt = (1+t^2)^(-3/2), dz/da = 1{|a| <= 6}), for the fused Pallas
    backward kernels which rematerialize the forward."""
    deg = len(_GELU_KS) - 1
    z = jnp.clip(a, -6.0, 6.0)
    u = z * z
    p = _GELU_KS[deg]
    pp = deg * _GELU_KS[deg]
    for i in range(deg - 1, 0, -1):
        p = p * u + _GELU_KS[i]
        pp = pp * u + i * _GELU_KS[i]
    p = p * u + _GELU_KS[0]
    t = z * p
    r = jax.lax.rsqrt(1.0 + t * t)
    f = t * r
    phi = 0.5 + 0.5 * f
    dtdz = p + 2.0 * u * pp
    fp = (r * r * r) * dtdz
    fp = jnp.where(jnp.abs(a) < 6.0, fp, 0.0)
    neg = a < -6.0
    val = jnp.where(neg, 0.0, a * phi)
    dval = jnp.where(neg, 0.0, phi + (0.5 * a) * fp)
    return val, dval


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
    a = _gelu_fast(a)  # erf-GELU in f32
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


def _bwd_kernel(x_ref, sh_ref, sc_ref, g_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                gr_ref, dx_ref, dsh_ref, dsc_ref, dg_ref, dw1_ref, db1_ref,
                dw2_ref, db2_ref):
    """Fused backward: recompute the forward from the saved inputs
    (flash-style, nothing else saved), then the chain rule in one pass.
    Grid (B, n_b) iterates row blocks fastest, so the per-batch (1, C)
    modulation-grad blocks stay resident across a batch element's row
    blocks (init at i == 0) and the weight-grad blocks are grid-invariant
    running sums (init at the first program) — the same race-free
    sequential-grid accumulation as ops/fused_layer_bwd."""
    f32 = jnp.float32
    first_rows = pl.program_id(1) == 0
    first_all = jnp.logical_and(pl.program_id(0) == 0, first_rows)

    x = x_ref[0]
    dt = x.dtype
    x32 = x.astype(f32)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=1, keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(var + _EPS)
    h_hat = (x32 - mean) * rstd
    sc = sc_ref[0].astype(f32)
    sh = sh_ref[0].astype(f32)
    g = g_ref[0].astype(f32)
    h = (h_hat * (1.0 + sc) + sh).astype(dt)
    a = jax.lax.dot_general(
        h, w1_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=f32
    ) + b1_ref[...].astype(f32)
    gelu_a, dgelu = _gelu_fast_with_grad(a)
    ge = gelu_a.astype(dt)
    y = jax.lax.dot_general(
        ge, w2_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=f32
    ) + b2_ref[...].astype(f32)

    dout = gr_ref[0].astype(f32)

    def acc(ref, val, first):
        @pl.when(first)
        def _():
            ref[...] = val

        @pl.when(jnp.logical_not(first))
        def _():
            ref[...] = ref[...] + val

    acc(dg_ref, jnp.sum(dout * y, axis=0, keepdims=True)[None], first_rows)
    dy = (dout * g).astype(dt)
    acc(dw2_ref, jax.lax.dot_general(
        ge, dy, (((0,), (0,)), ((), ())), preferred_element_type=f32), first_all)
    acc(db2_ref, jnp.sum(dy.astype(f32), axis=0, keepdims=True), first_all)
    dge = jax.lax.dot_general(
        dy, w2_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=f32)
    da = (dge * dgelu).astype(dt)
    acc(dw1_ref, jax.lax.dot_general(
        h, da, (((0,), (0,)), ((), ())), preferred_element_type=f32), first_all)
    acc(db1_ref, jnp.sum(da.astype(f32), axis=0, keepdims=True), first_all)
    dh = jax.lax.dot_general(
        da, w1_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=f32)

    acc(dsh_ref, jnp.sum(dh, axis=0, keepdims=True)[None], first_rows)
    acc(dsc_ref, jnp.sum(dh * h_hat, axis=0, keepdims=True)[None], first_rows)
    dhh = dh * (1.0 + sc)
    C = dh.shape[1]
    m1 = jnp.sum(dhh, axis=1, keepdims=True) * (1.0 / C)
    m2 = jnp.sum(dhh * h_hat, axis=1, keepdims=True) * (1.0 / C)
    dx_ln = rstd * (dhh - m1 - h_hat * m2)
    dx_ref[0] = (dout + dx_ln).astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "block_rows"))
def _pallas_bwd(x, sh, sc, g, w1, b1, w2, b2, grad,
                interpret: bool = False, block_rows: int = 512):
    """Pallas VJP twin of _pallas_fwd (VERDICT r4 item 3: adaln_mlp's XLA
    VJP was the last non-Pallas backward in the ATLAS train step). Pad rows
    (zero x, zero grad) contribute exactly zero to every accumulator."""
    B, N, C = x.shape
    F = w1.shape[1]
    f32 = jnp.float32

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
        grad = jnp.pad(grad, ((0, 0), (0, pad), (0, 0)))

    rep = lambda shape: pl.BlockSpec(shape, lambda b, i: (0,) * len(shape))
    per_b = pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0))
    rows = pl.BlockSpec((1, bn, C), lambda b, i: (b, i, 0))
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=(B, n_b),
        in_specs=[rows, per_b, per_b, per_b,
                  rep((C, F)), rep((1, F)), rep((F, C)), rep((1, C)), rows],
        out_specs=[rows, per_b, per_b, per_b,
                   rep((C, F)), rep((1, F)), rep((F, C)), rep((1, C))],
        out_shape=[jax.ShapeDtypeStruct((B, n_b * bn, C), x.dtype),
                   jax.ShapeDtypeStruct((B, 1, C), f32),
                   jax.ShapeDtypeStruct((B, 1, C), f32),
                   jax.ShapeDtypeStruct((B, 1, C), f32),
                   jax.ShapeDtypeStruct((C, F), f32),
                   jax.ShapeDtypeStruct((1, F), f32),
                   jax.ShapeDtypeStruct((F, C), f32),
                   jax.ShapeDtypeStruct((1, C), f32)],
        interpret=interpret,
        # the recompute + grad surfaces exceed the default 16M scoped-vmem
        # cap at block_rows=512 (measured: 16.9M needed at C=384) — same
        # raise as ops/fused_layer_bwd._VMEM_CAP
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(x, sh.reshape(B, 1, C), sc.reshape(B, 1, C), g.reshape(B, 1, C),
      w1, b1.reshape(1, F), w2, b2.reshape(1, C), grad)
    dx, dsh, dsc, dg, dw1, db1, dw2, db2 = outs
    if pad:
        dx = dx[:, :N]
    like = lambda v, ref: v.reshape(jnp.shape(ref)).astype(jnp.result_type(ref))
    return (dx.astype(x.dtype), like(dsh, sh), like(dsc, sc), like(dg, g),
            like(dw1, w1), like(db1, b1), like(dw2, w2), like(db2, b2))


# ---------------------------------------------------------------------------
def _xla_impl(x, sh, sc, g, w1, b1, w2, b2):
    """Reference composition (CPU path and VJP backward). Uses the same
    `_gelu_fast` as the kernels so kernel-vs-twin parity is exact; the fit
    itself is pinned against lax.erf-GELU at 3.1e-6."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    h = ((x32 - mean) * jax.lax.rsqrt(var + _EPS)).astype(x.dtype)
    h = h * (1 + sc[:, None]) + sh[:, None]
    a = h @ w1.astype(h.dtype) + b1.astype(h.dtype)
    a = _gelu_fast(a)
    y = a @ w2.astype(a.dtype) + b2.astype(a.dtype)
    return x + g[:, None] * y


@jax.custom_vjp
def _adaln_mlp_pallas(x, sh, sc, g, w1, b1, w2, b2):
    return _pallas_fwd(x, sh, sc, g, w1, b1, w2, b2)


def _fwd(x, sh, sc, g, w1, b1, w2, b2):
    return _pallas_fwd(x, sh, sc, g, w1, b1, w2, b2), (x, sh, sc, g, w1, b1, w2, b2)


def _bwd(res, grad):
    import os

    if os.environ.get("MDGEN_ADALN_MLP_BWD", "") == "xla":
        _, vjp = jax.vjp(_xla_impl, *res)
        return vjp(grad)
    return _pallas_bwd(*res, grad,
                       interpret=jax.default_backend() != "tpu")


_adaln_mlp_pallas.defvjp(_fwd, _bwd)


def adaln_mlp(x, sh, sc, g, w1, b1, w2, b2, *, force_xla: bool = False,
              force_pallas: bool = False):
    """x (B, N, C); sh/sc/g (B, C) AdaLN vectors; w1 (C, F) b1 (F) w2 (F, C)
    b2 (C). Returns x + g * mlp(modulate(LN(x), sh, sc)), x.dtype."""
    import os

    from ..parallel.kernel_sharding import get_kernel_mesh, shard_map_batch0

    B, N, C = x.shape
    env = os.environ.get("MDGEN_ADALN_MLP", "")
    force_xla = force_xla or env == "xla"
    force_pallas = force_pallas or env == "pallas"
    # Shape-gated: at SMALL row counts XLA's composition (which fuses the LN
    # stats into the fc2 matmul epilogue) edges out this kernel — 4954 vs
    # 4824 steps/s at the r2 bench shape (rows 3200; that shape now runs the
    # whole-trunk kernel anyway). At the LARGE shapes that actually reach
    # this op (the modular _layer_kernels path: ATLAS crop-256, long-T),
    # the kernel wins decisively — ATLAS forward 43.4 -> 38.4 ms (r3);
    # measured down the row axis: 16,000 rows (T=1000 B=4) 10.0 -> 9.43 ms
    # and 8,000 rows (B=2) 5.57 -> 5.28, so the gate sits at 8,000 (the
    # 3,200-row loss point stays XLA).
    use_pallas = C % 128 == 0 and (force_pallas or (
        not force_xla and jax.default_backend() == "tpu" and B * N >= 8000))
    if use_pallas:
        mesh = get_kernel_mesh()
        if jax.device_count() > 1 or mesh is not None:
            out = shard_map_batch0(
                lambda *a: _adaln_mlp_pallas(*a),
                (True, True, True, True, False, False, False, False),
                x, sh, sc, g, w1, b1, w2, b2)
            if out is None:
                # batch < mesh: the op is row-local, so shard the row axis
                # (VERDICT r3 weak #4)
                from ..parallel.kernel_sharding import shard_map_batch_seq

                out = shard_map_batch_seq(
                    lambda *a: _adaln_mlp_pallas(*a),
                    (1, "b", "b", "b", None, None, None, None),
                    x, sh, sc, g, w1, b1, w2, b2, seq_dim_size=N)
            if out is not None:
                return out
            if not force_pallas:
                return _xla_impl(x, sh, sc, g, w1, b1, w2, b2)
        return _adaln_mlp_pallas(x, sh, sc, g, w1, b1, w2, b2)
    return _xla_impl(x, sh, sc, g, w1, b1, w2, b2)
