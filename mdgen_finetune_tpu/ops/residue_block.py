"""Fused residue-attention BLOCK for small L at long T (Pallas TPU).

The long-T modular path (`fused_layer._layer_kernels`) runs the whole-layer
kernel's stage 1 as an XLA composition around the pair-loop attention kernel:
f32 LN + modulate over the (B, T*L, C) surface, a separate qkv projection,
and the out-proj/gate/residual — at T=1000 those XLA pieces cost ~2x the
attention core itself (convert_reduce 0.21 ms/layer + projection convs,
device profile r3). Residue attention is per-frame (reference
src/mdgen/model/latent_model.py:466-472: attend over L with (B, T) as
batch), so the whole stage blocks exactly over frames: grid
(B, Tp/tb), each program takes a tb-frame slice of the trunk-layout
activation and fuses

    LN (f32 lane stats) + AdaLN modulate + qkv projection + RoPE +
    pair-loop residue attention (base-2 no-max softmax, fold contract) +
    out-projection + gate + residual

with the projection weights resident in VMEM. Same math as the whole-layer
kernel's stage 1 (ops/fused_layer._kernel) and the `_layer_kernels` XLA
composition it replaces; backward is the VJP of the XLA twin.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .residue_attention import MAX_L, _tables_np
from .residue_attention import _xla_impl as _ra_xla_impl

_LN_EPS = 1e-6
_NEG_INF = -1e9


def _s1_kernel(x_ref, sh_ref, sc_ref, g_ref, wqkv_ref, bqkv_ref, wout_ref,
               bout_ref, bk_ref, bv_ref, bias_ref, cos_ref, sin_ref, fh_ref,
               s_ref, st_ref, o_ref, *, num_heads: int, head_dim: int):
    C = wout_ref.shape[1]
    tb, LC = x_ref.shape[1], x_ref.shape[2]
    L = LC // C
    J = L + 1
    half = head_dim // 2

    fh = fh_ref[...]  # (1, C)
    S = s_ref[...]    # (C, H) head-summing
    St = st_ref[...]  # (H, C)

    def rotate_half(x32):
        take_right = pltpu.roll(x32, C - half, 1)
        take_left = pltpu.roll(x32, half, 1)
        return -take_right * fh + take_left * (1 - fh)

    def rope_pos(x, pos):
        cos = cos_ref[pos].astype(jnp.float32)  # (1, C)
        sin = sin_ref[pos].astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        return (x32 * cos + rotate_half(x32) * sin).astype(x.dtype)

    # restack lanes -> residue-major rows (row r*tb + t)
    x = x_ref[0]
    X = jnp.concatenate([x[:, r * C:(r + 1) * C] for r in range(L)], axis=0)
    dt = X.dtype
    R = L * tb

    # LN (f32 lane stats) + AdaLN modulate over all stacked rows
    sh = sh_ref[0].astype(jnp.float32)
    sc = sc_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    x32 = X.astype(jnp.float32)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=1, keepdims=True) - mean * mean
    h = (x32 - mean) * jax.lax.rsqrt(var + _LN_EPS)
    h = (h * (1.0 + sc) + sh).astype(dt)

    qkv = (jax.lax.dot_general(
        h, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[...].astype(jnp.float32)).astype(dt)  # (R, 3C)

    # rope ONCE over all stacked rows (per-residue table rows tile to (R, C)
    # via free row concats of broadcasts — fused_layer._kernel's pattern)
    cr = jnp.concatenate(
        [jnp.broadcast_to(cos_ref[r].astype(jnp.float32), (tb, C))
         for r in range(L)], axis=0)
    sr = jnp.concatenate(
        [jnp.broadcast_to(sin_ref[r].astype(jnp.float32), (tb, C))
         for r in range(L)], axis=0)

    def rope_rows(x):
        x32 = x.astype(jnp.float32)
        return (x32 * cr + rotate_half(x32) * sr).astype(x.dtype)

    q_all = rope_rows(qkv[:, :C])
    k_all = rope_rows(qkv[:, C:2 * C])
    ks = [k_all[r * tb:(r + 1) * tb] for r in range(L)]
    ks.append(rope_pos(jnp.broadcast_to(bk_ref[...], (tb, C)).astype(dt), L))
    vs = [qkv[r * tb:(r + 1) * tb, 2 * C:] for r in range(L)]
    vs.append(jnp.broadcast_to(bv_ref[...], (tb, C)).astype(dt))

    bias = bias_ref[0]  # (tb, J)
    Sd = S.astype(dt)
    ls = []
    for j in range(J):
        k_t = jnp.concatenate([ks[j]] * L, axis=0)  # row-tile, ~free
        e = q_all * k_t
        l = jax.lax.dot_general(
            e, Sd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (R, H)
        ls.append(l + jnp.concatenate([bias[:, j:j + 1]] * L, axis=0))
    # base-2 no-max softmax: q arrived pre-scaled by scale * LOG2E (the fold
    # contract, ops/time_attention docstring); static overflow cap +
    # epsilon-guarded denominator (see residue_attention._kernel)
    ps = [jnp.exp2(jnp.minimum(l, 100.0)) for l in ls]
    denom = ps[0]
    for p in ps[1:]:
        denom = denom + p
    inv = 1.0 / (denom + 1e-30)
    acc = jnp.zeros((R, C), jnp.float32)
    for j in range(J):
        p_exp = jax.lax.dot_general(
            ps[j] * inv, St, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (R, C)
        v_t = jnp.concatenate([vs[j]] * L, axis=0).astype(jnp.float32)
        acc = acc + p_exp * v_t

    y = jax.lax.dot_general(
        acc.astype(dt), wout_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bout_ref[...].astype(jnp.float32)
    OUT = (x32 + g * y).astype(dt)
    for r in range(L):
        o_ref[0, :, r * C:(r + 1) * C] = OUT[r * tb:(r + 1) * tb]


def _pick_tb(Tp: int, L: int) -> int:
    """Frame-block size: target ~512-1024 stacked rows per program (the
    trunk kernel's sweet spot — big row blocks beat many sliver programs,
    PERF.md r2 lesson (c)). The caller pads Tp up to a whole number of
    blocks, so minimize the pad at the block count the target implies
    rather than forcing exact division (which collapsed to 40-frame
    slivers at Tp = 1000)."""
    target = max(8, (768 // L) // 8 * 8)
    if Tp <= target:
        return Tp
    nb = -(-Tp // target)
    return -(-(-(-Tp // nb)) // 8) * 8


def _s1_block_call(x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, mask,
                   num_heads: int, T: int, L: int, interpret: bool = False):
    """x (B, T*L, C) flat trunk rows (row t*L + l); mask (B, T, L) with
    1 = attendable key. Returns (B, T*L, C)."""
    B, N, C = x.shape
    D = C // num_heads
    J = L + 1
    Tp = -(-T // 8) * 8

    xt = x.reshape(B, T, L * C)
    if Tp != T:
        xt = jnp.pad(xt, ((0, 0), (0, Tp - T), (0, 0)))

    # additive key bias (B, Tp, J): masked keys -> -1e9; the learned bias
    # token (j = L) always attendable; pad frames are self-contained garbage
    # rows (sliced off below) so zero bias is fine there
    bias = (mask.astype(jnp.float32) - 1.0) * -_NEG_INF
    bias = jnp.concatenate([bias, jnp.zeros((B, T, 1), jnp.float32)], axis=2)
    if Tp != T:
        bias = jnp.pad(bias, ((0, 0), (0, Tp - T), (0, 0)))

    tb = _pick_tb(Tp, L)
    nb = pl.cdiv(Tp, tb)
    if nb * tb != Tp:
        xt = jnp.pad(xt, ((0, 0), (0, nb * tb - Tp), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, nb * tb - Tp), (0, 0)))

    cos_np, sin_np, fh_np, s_np = _tables_np(J, D, C)
    cos = jnp.asarray(cos_np, jnp.float32).reshape(J, 1, C)
    sin = jnp.asarray(sin_np, jnp.float32).reshape(J, 1, C)
    fh = jnp.asarray(fh_np, jnp.float32).reshape(1, C)
    S = jnp.asarray(s_np, jnp.float32)

    out = pl.pallas_call(
        functools.partial(_s1_kernel, num_heads=num_heads, head_dim=D),
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, tb, L * C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((C, 3 * C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, 3 * C), lambda b, i: (0, 0)),
            pl.BlockSpec((C, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, tb, J), lambda b, i: (b, i, 0)),
            pl.BlockSpec((J, 1, C), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((J, 1, C), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
            pl.BlockSpec((C, num_heads), lambda b, i: (0, 0)),
            pl.BlockSpec((num_heads, C), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tb, L * C), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, nb * tb, L * C), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
    )(xt, sh.reshape(B, 1, C), sc.reshape(B, 1, C), g.reshape(B, 1, C),
      wqkv, bqkv.reshape(1, 3 * C), wout, bout.reshape(1, C),
      bk.reshape(1, C).astype(x.dtype), bv.reshape(1, C).astype(x.dtype),
      bias, cos, sin, fh, S, S.T)
    return out[:, :T].reshape(B, T * L, C)


def _s1_xla(x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, mask, num_heads, T, L):
    """XLA twin (= the composition this kernel replaced in
    fused_layer._layer_kernels) — parity target and custom-VJP backward."""
    B, N, C = x.shape
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    h = ((x32 - mean) * jax.lax.rsqrt(var + _LN_EPS)).astype(x.dtype)
    h = h * (1 + sc[:, None]) + sh[:, None]
    qkv = h @ wqkv.astype(h.dtype) + bqkv.astype(h.dtype)
    q, k, v = (a.reshape(B, T, L, C) for a in
               (qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]))
    out = _ra_xla_impl(q, k, v, bk, bv, mask, num_heads, base2=True)
    y = out.reshape(B, N, C) @ wout.astype(x.dtype) + bout.astype(x.dtype)
    return x + g[:, None] * y


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14))
def _s1_block_pallas(x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, mask,
                     num_heads, T, L, interpret=False):
    return _s1_block_call(x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, mask,
                          num_heads, T, L, interpret=interpret)


def _s1b_fwd(x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, mask,
             num_heads, T, L, interpret):
    args = (x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, mask)
    return _s1_block_call(*args, num_heads, T, L, interpret=interpret), args


def _s1b_bwd(num_heads, T, L, interpret, res, grad):
    _, vjp = jax.vjp(lambda *a: _s1_xla(*a, num_heads, T, L), *res)
    grads = vjp(grad)
    return grads[:10] + (None,)


_s1_block_pallas.defvjp(_s1b_fwd, _s1b_bwd)


def _s1_frame_sharded(args, num_heads, T, L, interp):
    """Frame-sharded small-L residue-stage execution for batch < mesh (the
    rows-kernel analogue in ops/time_attention._rows_frame_sharded): rope is
    residue-positional, so the local call on a frame chunk is exact."""
    from ..parallel.kernel_sharding import shard_map_batch_seq

    x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, mask = args
    B, N, C = x.shape

    def local(x3, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, mask):
        Bl, Tl, _ = x3.shape
        out = _s1_block_pallas(
            x3.reshape(Bl, Tl * L, C), sh, sc, g, wqkv, bqkv, wout, bout,
            bk, bv, mask, num_heads, Tl, L, interp)
        return out.reshape(Bl, Tl, L * C)

    out = shard_map_batch_seq(
        local, (1, "b", "b", "b", None, None, None, None, None, None, 1),
        x.reshape(B, T, L * C), sh, sc, g, wqkv, bqkv, wout, bout, bk, bv,
        mask, seq_dim_size=T)
    return None if out is None else out.reshape(B, N, C)


def residue_block(x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, mask, *,
                  num_heads: int, tl: tuple, force_xla: bool = False,
                  force_pallas: bool = False):
    """The whole small-L residue-attention stage as one op: x (B, T*L, C),
    per-element AdaLN rows sh/sc/g (B, C), folded wqkv (C, 3C) (q columns
    carry scale * LOG2E), mask (B, T, L). Reference stage:
    src/mdgen/model/latent_model.py:466-472 + the surrounding LN/modulate/
    gate of the DiT block."""
    import os

    from ..parallel.kernel_sharding import get_kernel_mesh, shard_map_batch0

    T, L = tl
    B, N, C = x.shape
    env = os.environ.get("MDGEN_S1_BLOCK", "")  # "xla" | "pallas" A/B override
    force_xla = force_xla or env == "xla"
    force_pallas = force_pallas or env == "pallas"
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = force_pallas or (
        not force_xla and on_tpu and C % 128 == 0 and L <= MAX_L)
    if use_pallas:
        interp = not on_tpu

        def local(*a):
            return _s1_block_pallas(*a, num_heads, T, L, interp)

        batched = (True,) * 4 + (False,) * 6 + (True,)
        if jax.device_count() > 1 or get_kernel_mesh() is not None:
            out = shard_map_batch0(local, batched, x, sh, sc, g, wqkv, bqkv,
                                   wout, bout, bk, bv, mask)
            if out is None:
                # batch < mesh (T=1000 B=1): shard the FRAME axis — the
                # kernel grids over frame blocks and per-frame residue
                # attention is embarrassingly parallel over T, so the local
                # call on a frame chunk is exact (VERDICT r3 weak #4)
                out = _s1_frame_sharded(
                    (x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, mask),
                    num_heads, T, L, interp)
            if out is not None:
                return out
            if not force_pallas:
                return _s1_xla(x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv,
                               mask, num_heads, T, L)
        return local(x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, mask)
    return _s1_xla(x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, mask,
                   num_heads, T, L)
