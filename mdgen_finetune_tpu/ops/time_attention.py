"""Pallas TPU fused frame(time)-attention for SMALL L in (B, T, L, C) layout.

The denoiser's frame-attention stage (reference hot loop,
src/mdgen/model/latent_model.py:474-486) attends over T with (B, L) as batch.
At small L the XLA composition is the biggest cost in the forward (~0.58
ms/layer at the bench shape, PERF.md r2): it transposes the activation to
(B*L, T, C), head-splits to D=24-minor tensors, runs 2048 tiny batched
matmuls at <1% MXU utilization, and materializes the (B*L, H, T, T) f32
logits in HBM. This kernel removes all of it with the same lessons the
residue kernel encoded (keep kernel math 2D, fold tiny dims into lanes,
fat programs):

- inputs ride as (B, T, L*C) — a free contiguous reshape — with grid (B,):
  32 fat programs at the bench shape, no activation transpose ever exists;
- per residue r, q/k/v slices are static lane-tile slices (C = 3 tiles);
- heads are processed in GROUPS that fit one 128-lane tile (5 heads x D=24):
  for group g the stacked query block QS = [q_rg * m_0; ...; q_rg * m_gh]
  (gh*T, gh*D) computes EVERY head's logits in ONE MXU matmul
  QS @ kb_rg^T with a single-K-tile contraction — ~1.25x redundant flops
  instead of the 16x of a full-C masked formulation, and no D=24-minor
  tensor is ever formed;
- softmax runs on (gh*T, TK) f32 entirely in VMEM; PV is one more single-
  K-tile matmul; the per-head rows are unstacked with the same masks and
  lane-concatenated into the (T, C) output slice;
- RoPE's rotate-half is two lane-rolls + constant sign masks; the learned
  bias-KV token is appended as one key row, roped at position T
  (mha.py:265-280, 356-357).

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

from .fused_attention import _attention_xla

MAX_L = 8  # per-residue unrolled loop
MAX_T = 256  # full-K/V-in-VMEM design; longer T uses the flash path via XLA

_NEG_INF = -1e9

# Base-2 softmax contract: the denoiser's weight fold
# (models/denoiser._fold_fused_args) multiplies the time-attention q scale by
# LOG2E, so every consumer of those logits computes softmax with exp2 — exp's
# own lowering is exp2(log2e * x), and folding the constant into the already-
# folded scale deletes a full-logits-surface multiply from the kernels
# (measured -1.7% whole-layer kernel time, PERF.md r3). Normalized
# probabilities are IDENTICAL (softmax2(log2e * x) == softmax(x)); hand-
# written adjoints gain one LN2 factor on dlogits.
LOG2E = float(np.log2(np.e))
LN2 = float(np.log(2.0))


@functools.lru_cache(maxsize=16)
def _rope_tables_np(n_pos: int, head_dim: int, channels: int):
    """(n_pos, C) cos/sin tables tiled across heads, plus the rotate-half
    first-half lane mask (1, C)."""
    inv_freq = 1.0 / (10000 ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))
    t = np.arange(n_pos, dtype=np.float32)
    freqs = np.einsum("i,j->ij", t, inv_freq)
    emb = np.concatenate([freqs, freqs], axis=-1)  # (n_pos, D)
    n_heads = channels // head_dim
    cos = np.tile(np.cos(emb), (1, n_heads))
    sin = np.tile(np.sin(emb), (1, n_heads))
    lane = np.arange(channels) % head_dim
    first_half = (lane < head_dim // 2).astype(np.float32)
    return cos, sin, first_half


def _group_masks(head_dim: int, group_heads: int, dtype):
    """(gh, 1, gh*D) one-hot-per-head lane masks for the stacked rows,
    generated with iotas (Pallas kernels cannot capture host constants)."""
    W = group_heads * head_dim
    lane = jax.lax.broadcasted_iota(jnp.int32, (group_heads, 1, W), 2)
    j = jax.lax.broadcasted_iota(jnp.int32, (group_heads, 1, W), 0)
    return ((lane >= j * head_dim) & (lane < (j + 1) * head_dim)).astype(dtype)


def _grouped_attend(q_r, kbT_r, vb_r, bias, H, D, probes: str = "",
                    base2: bool = False):
    """Grouped-stack attention core: q_r (R, C), kbT_r (C, TK), vb_r (TK, C),
    bias (1, TK) additive; heads processed Gh = 128 // D per lane-tile group,
    every matmul a single-K-tile MXU op. Returns (R, C) f32. ``probes`` is a
    perf-ablation switch (fused_layer stage probes): "V" skips the logits/
    softmax (uniform p), "P" skips the PV product, "Q" skips the QS stacking
    (single unmasked matmul, wrong-but-shaped logits).

    r3 measurement notes (tools/micro_ops.py + stage probes): the kernel is
    bound by VMEM traffic and dependent-chain latency, not dot count — MXU
    dots at these shapes run near peak; a stacking-free per-head variant
    (64 small chains) measured ~2x slower, and a softmax-merged-across-
    residues variant also lost. The surviving wins are bf16 unnormalized p
    with the division deferred past the PV dot."""
    R, C = q_r.shape
    Gh = max(1, 128 // D)
    while Gh > 1 and H % Gh:
        Gh -= 1  # even groups: a ragged tail group costs more than 128-W lanes
    # "H"/"I" probes: 2x/4x wider head groups — halves/quarters the number of
    # dependent logits->softmax->PV chains at the cost of proportionally more
    # wasted PV/collapse lanes (the stacked rows span more heads)
    if "H" in probes and H % (Gh * 2) == 0:
        Gh *= 2
    if "I" in probes and H % (Gh * 4) == 0:
        Gh *= 4
    TK = kbT_r.shape[1]
    outs = []
    h0 = 0
    while h0 < H:
        gh = min(Gh, H - h0)
        W = gh * D
        lo = h0 * D
        q_rg = q_r[:, lo:lo + W]  # (R, W)
        kbT_rg = kbT_r[lo:lo + W]  # (W, TK) sublane slice, W multiple of 8
        vb_rg = vb_r[:, lo:lo + W]
        masks = _group_masks(D, gh, q_rg.dtype)  # (gh, 1, W)
        if "V" in probes:
            p = jnp.full((gh * R, TK), 1.0 / TK, q_rg.dtype)
            inv = 1.0
        else:
            if "Q" in probes:
                qs = jnp.broadcast_to(q_rg[None], (gh, R, W)).reshape(gh * R, W)
            else:
                # stacked rows: block j is q_rg with every lane outside head j
                # zeroed, so ONE (gh*R, W) @ (W, TK) matmul yields every
                # head's logits
                qs = (q_rg[None] * masks).reshape(gh * R, W)
            logits = jax.lax.dot_general(
                qs, kbT_rg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )  # (gh*R, TK)
            if "b" in probes:  # perf probe: bf16 softmax traffic
                logits = logits.astype(qs.dtype)
            logits = logits + bias.astype(logits.dtype)
            if "E" in probes:  # perf probe: exp cost (wrong values, same shapes)
                p32 = logits - jnp.max(logits, axis=1, keepdims=True)
            elif base2:
                # q arrived pre-scaled by LOG2E (module docstring). NO max
                # tree (0.011 ms/layer): softmax is shift-invariant, and in
                # base 2 a static overflow cap replaces the shift — the min
                # runs at subtract cost on the same surface. Bounds:
                # exp2(100) = 1.3e30, sum <= 4096 keys * 2^100 = 5e33 << f32
                # max; bf16 p max 2^100 << bf16 max. An all-underflow row
                # (every valid logit < -126, incl. the always-attendable
                # learned bias token — a diverged model) yields 0-weights
                # via the epsilon guard instead of 0/0 NaN.
                p32 = jnp.exp2(jnp.minimum(logits, 100.0))
            else:
                m = jnp.max(logits, axis=1, keepdims=True)
                p32 = jnp.exp(logits - m)
            # unnormalized bf16 p: the PV dot reads bf16 and the softmax
            # division is deferred past it, where the divided surface is W
            # lanes instead of TK (r3 VMEM-traffic reduction)
            p = p32.astype(q_rg.dtype)
            if "s" in probes:  # perf probe: denominator cost (unnormalized out)
                inv = 1.0
            elif "S" in probes:  # perf probe: r2 form — sum of the BF16 p
                # (an extra bf16->f32 copy of the full surface; also tried:
                # the denominator as an MXU ones-dot — 0.287/0.399 ms vs the
                # 0.252 tree for (TK, W)/(TK, 1) ones, PERF.md r3 dead-ends)
                inv = 1.0 / jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
            else:
                # denominator from the f32 exp output directly (it already
                # exists pre-cast): no convert copy feeds the lane-sum tree
                denom = jnp.sum(p32, axis=1, keepdims=True)
                if base2:
                    denom = denom + 1e-30  # see the no-max note above
                inv = 1.0 / denom
        if "P" in probes:
            outs.append(q_rg.astype(jnp.float32) + p[:R, :1].astype(jnp.float32) * 0.0)
            h0 += gh
            continue
        pv = jax.lax.dot_general(
            p, vb_rg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv  # (gh*R, W)
        if "F" in probes:  # perf probe: masked head-collapse cost
            outs.append(pv[:R])
        else:
            outs.append(jnp.sum(pv.reshape(gh, R, W) * masks.astype(jnp.float32), axis=0))
        h0 += gh
    return jnp.concatenate(outs, axis=1)  # (R, C) f32


def _kernel(q_ref, k_ref, v_ref, bk_ref, bv_ref, bias_ref, cos_ref, sin_ref, fh_ref,
            o_ref, *, num_heads: int, head_dim: int, channels: int,
            base2: bool = False):
    """Everything here is 8-sublane/128-lane aligned by construction: T is
    pre-padded to a multiple of 8 (garbage rows masked via the additive
    bias), and the learned bias-KV token occupies a full 8-row block at the
    end of kb/vb (one attendable copy, the rest masked), so the stacked-row
    reshapes and matmul operands never relayout. (RoPE stays in-kernel: an
    XLA-side rope on the folded layout measured 15% slower end-to-end.)"""
    C, H, D = channels, num_heads, head_dim
    Tp = q_ref.shape[1]  # padded query rows (multiple of 8)
    LC = q_ref.shape[2]
    L = LC // C
    TK = Tp + 8  # keys + 8-row bias-token block
    half = D // 2
    Gh = max(1, 128 // D)  # heads per lane-tile group

    fh = fh_ref[...]  # (1, C)

    def rotate_half(x32):
        take_right = pltpu.roll(x32, C - half, 1)
        take_left = pltpu.roll(x32, half, 1)
        return -take_right * fh + take_left * (1 - fh)

    def rope(x, n0, n):
        # rows n0..n0+n-1 of the position tables; f32 compute, back to input dtype
        cos = cos_ref[pl.ds(n0, n)].astype(jnp.float32)  # (n, C)
        sin = sin_ref[pl.ds(n0, n)].astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        return (x32 * cos + rotate_half(x32) * sin).astype(x.dtype)

    # rows Tp..Tp+7 of the tables carry position T's values, so the whole
    # 8-row bias block ropes to the reference's position-T embedding
    bk_blk = rope(jnp.broadcast_to(bk_ref[...], (8, C)), Tp, 8)
    bv_blk = jnp.broadcast_to(bv_ref[...], (8, C))

    BB = q_ref.shape[0]  # batch elements per program
    for bb in range(BB):
      for r in range(L):
        q_r = rope(q_ref[bb, :, r * C:(r + 1) * C], 0, Tp)  # (Tp, C)
        k_r = rope(k_ref[bb, :, r * C:(r + 1) * C], 0, Tp)
        kb_r = jnp.concatenate([k_r, bk_blk.astype(k_r.dtype)], axis=0)  # (TK, C)
        # one hoisted transpose per residue puts K on the sublane dim for the
        # logits matmuls (otherwise Mosaic re-transposes kb per head group)
        kbT_r = kb_r.T  # (C, TK)
        vb_r = jnp.concatenate([v_ref[bb, :, r * C:(r + 1) * C], bv_blk.astype(v_ref.dtype)], axis=0)
        bias = bias_ref[bb, r:r + 1, :]  # (1, TK): -1e9 on masked/pad keys

        o_ref[bb, :, r * C:(r + 1) * C] = _grouped_attend(
            q_r, kbT_r, vb_r, bias, H, D, base2=base2
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret", "base2"))
def _pallas_fwd(q, k, v, bias_k, bias_v, key_valid, num_heads: int, interpret: bool = False,
                base2: bool = False):
    B, T, L, C = q.shape
    D = C // num_heads
    Tp = -(-T // 8) * 8  # aligned rows: in-kernel reshapes/operands never relayout
    TK = Tp + 8  # + 8-row bias-token block (one attendable copy)

    q, k, v = (a.reshape(B, T, L * C) for a in (q, k, v))
    if Tp != T:
        zpad = ((0, 0), (0, Tp - T), (0, 0))
        q, k, v = jnp.pad(q, zpad), jnp.pad(k, zpad), jnp.pad(v, zpad)
    # additive logit bias per (b, residue, key): 0 attendable / -1e9 masked;
    # keys T..Tp-1 are row padding, Tp is the (always-attendable) learned
    # bias token, Tp+1..TK-1 are its masked copies
    bias = (key_valid.astype(jnp.float32) - 1.0) * -_NEG_INF  # (B, L, T)
    tail = jnp.full((B, L, TK - T), _NEG_INF, jnp.float32)
    tail = tail.at[:, :, Tp - T].set(0.0)
    bias = jnp.concatenate([bias, tail], axis=2)

    cos_np, sin_np, fh_np = _rope_tables_np(T + 1, D, C)
    # rows 0..Tp-1: positions 0..Tp-1 (garbage past T, masked); rows Tp..TK-1:
    # position T for the whole bias block
    def table(base):
        ext_q = base[list(range(T)) + [T - 1] * (Tp - T)] if Tp != T else base[:T]
        return np.concatenate([ext_q, np.tile(base[T:T + 1], (8, 1))], axis=0)

    cos = jnp.asarray(table(cos_np), jnp.float32)
    sin = jnp.asarray(table(sin_np), jnp.float32)
    fh = jnp.asarray(fh_np, jnp.float32).reshape(1, C)
    bk = bias_k.reshape(1, C).astype(q.dtype)
    bv = bias_v.reshape(1, C).astype(q.dtype)

    # one batch element per program measured fastest (multi-b blocks reduce
    # the grid's DMA/compute overlap: 5173 vs 5017/4907 at BB=2/4, PERF.md r2)
    BB = 1
    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, head_dim=D, channels=C,
                          base2=base2),
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec((BB, Tp, L * C), lambda b: (b, 0, 0)),
            pl.BlockSpec((BB, Tp, L * C), lambda b: (b, 0, 0)),
            pl.BlockSpec((BB, Tp, L * C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((BB, L, TK), lambda b: (b, 0, 0)),
            pl.BlockSpec((TK, C), lambda b: (0, 0)),
            pl.BlockSpec((TK, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BB, Tp, L * C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Tp, L * C), q.dtype),
        interpret=interpret,
    )(q, k, v, bk, bv, bias, cos, sin, fh)
    return out[:, :T].reshape(B, T, L, C)




def _kernel_blocked(q_ref, kb_ref, vb_ref, bias_ref, cos_ref, sin_ref, fh_ref, o_ref,
                    *, head_dim: int, num_heads: int, tq: int,
                    base2: bool = False):
    """Blocked grouped-stack variant for long T / large L: grid (B, L), one
    (batch element, residue) per program with the FULL roped K/V slice in
    VMEM and an internal loop over query blocks (no online softmax needed).
    K/V are roped/transposed ONCE per program — the r2 version gridded over
    query blocks too and re-roped the whole K slice n_q times, which made
    T=1000 lose to the flash path (PERF.md r2). kb/vb arrive with the 8-row
    bias-token block already appended (one attendable copy, rest masked)."""
    D, H = head_dim, num_heads
    Tp, C = q_ref.shape[1:]
    TK = kb_ref.shape[1]
    half = D // 2

    fh = fh_ref[...]

    def rotate_half(x32):
        take_right = pltpu.roll(x32, C - half, 1)
        take_left = pltpu.roll(x32, half, 1)
        return -take_right * fh + take_left * (1 - fh)

    def rope(x, n0, n):
        cos = cos_ref[pl.ds(n0, n)].astype(jnp.float32)
        sin = sin_ref[pl.ds(n0, n)].astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        return (x32 * cos + rotate_half(x32) * sin).astype(x.dtype)

    kb = rope(kb_ref[0], 0, TK)  # (TK, C); bias rows hit position-T table rows
    kbT = kb.T  # (C, TK) — one transpose per program
    vb = vb_ref[0]
    bias = bias_ref[0]  # (1, TK)
    for i in range(Tp // tq):
        q_blk = rope(q_ref[0, i * tq:(i + 1) * tq], i * tq, tq)  # (tq, C)
        o_ref[0, i * tq:(i + 1) * tq] = _grouped_attend(
            q_blk, kbT, vb, bias, H, D, base2=base2
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret", "base2"))
def _pallas_fwd_blocked(q, k, v, bias_k, bias_v, key_valid, num_heads: int,
                        interpret: bool = False, base2: bool = False):
    B, T, L, C = q.shape
    D = C // num_heads
    Tp = -(-T // 8) * 8
    TK = Tp + 8

    q, k, v = (a.reshape(B, T, L * C) for a in (q, k, v))
    if Tp != T:
        zpad = ((0, 0), (0, Tp - T), (0, 0))
        q, k, v = jnp.pad(q, zpad), jnp.pad(k, zpad), jnp.pad(v, zpad)
    # append the 8-row bias-token block (tiled across residues) outside
    bkt = jnp.broadcast_to(jnp.tile(bias_k.reshape(1, C), (1, L)).astype(q.dtype), (B, 8, L * C))
    bvt = jnp.broadcast_to(jnp.tile(bias_v.reshape(1, C), (1, L)).astype(q.dtype), (B, 8, L * C))
    kb = jnp.concatenate([k, bkt], axis=1)  # (B, TK, L*C)
    vb = jnp.concatenate([v, bvt], axis=1)

    bias = (key_valid.astype(jnp.float32) - 1.0) * -_NEG_INF  # (B, L, T)
    tail = jnp.full((B, L, TK - T), _NEG_INF, jnp.float32)
    tail = tail.at[:, :, Tp - T].set(0.0)
    bias = jnp.concatenate([bias, tail], axis=2).reshape(B * L, 1, TK)

    # pad the QUERY rows up to a multiple of the chosen block (keys stay TK;
    # the pad rows' outputs are sliced off)
    tq = _blocked_tq(Tp, TK, C)
    Tp2 = -(-Tp // tq) * tq
    if Tp2 != Tp:
        q = jnp.pad(q, ((0, 0), (0, Tp2 - Tp), (0, 0)))

    cos_np, sin_np, fh_np = _rope_tables_np(T + 1, D, C)

    def table(base):
        ext_q = base[list(range(T)) + [T - 1] * (Tp - T)] if Tp != T else base[:T]
        t = np.concatenate([ext_q, np.tile(base[T:T + 1], (8, 1))], axis=0)  # (TK,)
        if Tp2 + 8 > TK:  # rows for the q pad tail (garbage rows, sliced off)
            t = np.concatenate([t, np.tile(t[-1:], (Tp2 + 8 - TK, 1))], axis=0)
        return t

    cos = jnp.asarray(table(cos_np), jnp.float32)
    sin = jnp.asarray(table(sin_np), jnp.float32)
    fh = jnp.asarray(fh_np, jnp.float32).reshape(1, C)

    out = pl.pallas_call(
        functools.partial(_kernel_blocked, head_dim=D, num_heads=num_heads, tq=tq,
                          base2=base2),
        grid=(B, L),
        in_specs=[
            pl.BlockSpec((1, Tp2, C), lambda b, r: (b, 0, r)),
            pl.BlockSpec((1, TK, C), lambda b, r: (b, 0, r)),
            pl.BlockSpec((1, TK, C), lambda b, r: (b, 0, r)),
            pl.BlockSpec((1, 1, TK), lambda b, r, L=L: (b * L + r, 0, 0)),
            pl.BlockSpec((max(TK, Tp2 + 8), C), lambda b, r: (0, 0)),
            pl.BlockSpec((max(TK, Tp2 + 8), C), lambda b, r: (0, 0)),
            pl.BlockSpec((1, C), lambda b, r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Tp2, C), lambda b, r: (b, 0, r)),
        out_shape=jax.ShapeDtypeStruct((B, Tp2, L * C), q.dtype),
        interpret=interpret,
        # the grouped-attend stacked intermediates ((gh*tq, TK) f32 logits
        # etc.) exceed the compiler's default 16M scoped-vmem cap at T=1000;
        # raise the per-kernel cap (v5e has 128M physical VMEM)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
    )(q, kb, vb, bias, cos, sin, fh)
    return out[:, :T].reshape(B, T, L, C)


def _block_kernel_blocked(x_ref, sh_ref, sc_ref, g_ref, wqkv_ref, bqkv_ref,
                          wout_ref, bout_ref, bk_ref, bv_ref, bias_ref,
                          cos_ref, sin_ref, fh_ref, o_ref, *,
                          num_heads: int, head_dim: int, tq: int, kq: int,
                          pad_dim: int = 0, probes: str = ""):
    """Blocked whole-BLOCK variant for long T / large L: grid (B, L), one
    (batch element, residue) per program — LN (f32 lane stats) + AdaLN
    modulate + qkv projection (weights resident in VMEM) + RoPE + full-K/V
    grouped-stack attention with an internal query-block loop +
    out-projection + gate + residual. Nothing but the raw activation slice
    crosses HBM: the host-side Tp pads, projected-tensor materializations,
    bias-KV concats, and f32 LN converts of the modular composition all
    disappear (r3: ATLAS forward profile showed ~10 ms/fwd of exactly this
    glue). ``kq`` = key rows (the 8-aligned T); query rows may be padded
    further to a tq multiple (outputs sliced by the host).

    Rank-4 refs ((1, 1, rows, C) blocks) serve the transpose-free residue
    routing (`_block_pallas_fwd_blocked_rows`): same math, the rows are the
    L residues of one frame instead of the T frames of one residue."""
    H, D = num_heads, head_dim
    rank4 = len(x_ref.shape) == 4
    Tp2, C = x_ref.shape[-2], x_ref.shape[-1]
    half = D // 2
    TK = kq + 8
    # lane-PADDED head layout (pad_dim = Dp > D, e.g. 32 for D = 24): the
    # projections arrive pre-padded from the host (zero pad lanes/rows) so
    # every grouped-stack core matmul runs on exact 128-lane tiles — the
    # same trade the trunk kernel adopted (PERF.md: alignment beats the
    # padded-projection flops at D = 24)
    Dp = pad_dim or D
    Cp = H * Dp

    fh = fh_ref[...]  # (1, Cp) — zero on pad lanes when padded
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
        if "R" in probes:  # perf probe: rope cost (wrong values)
            return x
        cos = cos_ref[pl.ds(n0, n)].astype(jnp.float32)
        sin = sin_ref[pl.ds(n0, n)].astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        return (x32 * cos + rotate_half(x32) * sin).astype(x.dtype)

    x = x_ref[0, 0] if rank4 else x_ref[0]  # (Tp2, C)
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    if "l" in probes:  # perf probe: LN lane-stats cost (wrong values)
        h = (x32 * (1.0 + sc) + sh).astype(dt)
    else:
        mean = jnp.mean(x32, axis=1, keepdims=True)
        var = jnp.mean(x32 * x32, axis=1, keepdims=True) - mean * mean
        h = (x32 - mean) * jax.lax.rsqrt(var + _LN_EPS)
        h = (h * (1.0 + sc) + sh).astype(dt)
    qkv = (jax.lax.dot_general(
        h, wqkv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + bqkv).astype(dt)  # (Tp2, 3Cp)

    # keys: the first kq rows (mask bias covers the T..kq pad) + the 8-row
    # learned bias-token block (roped at position-kq table rows)
    bk_blk = rope(jnp.broadcast_to(bk_ref[...], (8, Cp)).astype(dt), kq, 8)
    bv_blk = jnp.broadcast_to(bv_ref[...], (8, Cp)).astype(dt)
    kb = jnp.concatenate([rope(qkv[0:kq, Cp:2 * Cp], 0, kq), bk_blk], axis=0)
    kbT = kb.T  # (Cp, TK) — one transpose per program
    vb = jnp.concatenate([qkv[0:kq, 2 * Cp:], bv_blk], axis=0)
    bias = bias_ref[0]  # (1, TK)

    for i in range(Tp2 // tq):
        q_blk = rope(qkv[i * tq:(i + 1) * tq, :Cp], i * tq, tq)
        # base2: the block family's wqkv carries scale * LOG2E (module note)
        att = _grouped_attend(q_blk, kbT, vb, bias, H, Dp, base2=True,
                              probes=probes)
        y = jax.lax.dot_general(
            att.astype(dt), wout, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bout  # (tq, C) f32
        o = (x32[i * tq:(i + 1) * tq] + g * y).astype(o_ref.dtype)
        if rank4:
            o_ref[0, 0, i * tq:(i + 1) * tq] = o
        else:
            o_ref[0, i * tq:(i + 1) * tq] = o


@functools.partial(jax.jit, static_argnames=("num_heads", "T", "L", "interpret",
                                              "t_logical", "probes"))
def _block_pallas_fwd_blocked(x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v,
                              key_valid, num_heads: int, T: int, L: int,
                              interpret: bool = False, t_logical: int = None,
                              probes: str = ""):
    # ``t_logical``: the REAL frame count when x arrives frame-padded
    # (padded-trunk modular routing, fused_layer r3s3) — frames
    # t_logical..T-1 are masked garbage (key_valid zeros) and the learned
    # bias-KV token ropes at position t_logical, exactly as the unpadded
    # call ropes it at position T (reference mha.py:265-280).
    import os

    TL = T if t_logical is None else t_logical

    B, N, C = x.shape
    H = num_heads
    D = C // H
    Tp = -(-T // 8) * 8
    TK = Tp + 8
    # lane-padded head layout (Dp = 32 when D = 24): pre-pad the PROJECTION
    # weights (zero pad lanes/rows) so the kernel's grouped-stack core runs
    # on exact 128-lane tiles. The pad multiplies EVERY core matmul's flops
    # by Dp/D (4/3), so it only wins where misaligned-tile overhead dominates
    # raw flops: measured ATLAS (TK=264) 28.4 -> 27.2 ms, but T=1000
    # (TK=1008) 10.0 -> 13.2 ms — the big-T logits/PV surfaces tile fine
    # compact. Gate on key length; MDGEN_BLOCKED_COMPACT=1 A/B-reverts.
    Dp = D if (128 % D == 0 or TK > 512
               or os.environ.get("MDGEN_BLOCKED_COMPACT", "")) else 32
    Cp = H * Dp

    x = x.reshape(B, T, L * C)
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))

    bias = (key_valid.astype(jnp.float32) - 1.0) * -_NEG_INF  # (B, L, T)
    tail = jnp.full((B, L, TK - T), _NEG_INF, jnp.float32)
    tail = tail.at[:, :, Tp - T].set(0.0)
    bias = jnp.concatenate([bias, tail], axis=2).reshape(B * L, 1, TK)

    tq = _blocked_tq(Tp, TK, max(C, Cp), budget=11 * 1024 * 1024)
    Tp2 = -(-Tp // tq) * tq
    if Tp2 != Tp:
        x = jnp.pad(x, ((0, 0), (0, Tp2 - Tp), (0, 0)))

    if Dp != D:
        wqkv_p = jnp.pad(wqkv.reshape(C, 3, H, D),
                         ((0, 0), (0, 0), (0, 0), (0, Dp - D))).reshape(C, 3 * Cp)
        bqkv_p = jnp.pad(bqkv.reshape(3, H, D),
                         ((0, 0), (0, 0), (0, Dp - D))).reshape(3 * Cp)
        wout_p = jnp.pad(wout.reshape(H, D, C),
                         ((0, 0), (0, Dp - D), (0, 0))).reshape(Cp, C)
        bk_p = jnp.pad(bias_k.reshape(H, D), ((0, 0), (0, Dp - D))).reshape(1, Cp)
        bv_p = jnp.pad(bias_v.reshape(H, D), ((0, 0), (0, Dp - D))).reshape(1, Cp)
    else:
        wqkv_p, bqkv_p, wout_p = wqkv, bqkv, wout
        bk_p, bv_p = bias_k.reshape(1, C), bias_v.reshape(1, C)

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
        t = np.concatenate([ext_q, np.tile(base[TL:TL + 1], (8, 1))], axis=0)
        if Tp2 + 8 > TK:
            t = np.concatenate([t, np.tile(t[-1:], (Tp2 + 8 - TK, 1))], axis=0)
        return t

    cos = jnp.asarray(table(cos_np), jnp.float32)
    sin = jnp.asarray(table(sin_np), jnp.float32)
    fh = jnp.asarray(fh_np, jnp.float32).reshape(1, Cp)

    out = pl.pallas_call(
        functools.partial(_block_kernel_blocked, num_heads=num_heads, head_dim=D,
                          tq=tq, kq=Tp, pad_dim=Dp if Dp != D else 0,
                          probes=probes),
        grid=(B, L),
        in_specs=[
            pl.BlockSpec((1, Tp2, C), lambda b, r: (b, 0, r)),
            pl.BlockSpec((1, 1, C), lambda b, r: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, r: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, r: (b, 0, 0)),
            pl.BlockSpec((C, 3 * Cp), lambda b, r: (0, 0)),
            pl.BlockSpec((1, 3 * Cp), lambda b, r: (0, 0)),
            pl.BlockSpec((Cp, C), lambda b, r: (0, 0)),
            pl.BlockSpec((1, C), lambda b, r: (0, 0)),
            pl.BlockSpec((1, Cp), lambda b, r: (0, 0)),
            pl.BlockSpec((1, Cp), lambda b, r: (0, 0)),
            pl.BlockSpec((1, 1, TK), lambda b, r, L=L: (b * L + r, 0, 0)),
            pl.BlockSpec((max(TK, Tp2 + 8), Cp), lambda b, r: (0, 0)),
            pl.BlockSpec((max(TK, Tp2 + 8), Cp), lambda b, r: (0, 0)),
            pl.BlockSpec((1, Cp), lambda b, r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Tp2, C), lambda b, r: (b, 0, r)),
        out_shape=jax.ShapeDtypeStruct((B, Tp2, L * C), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
    )(x, sh.reshape(B, 1, C), sc.reshape(B, 1, C), g.reshape(B, 1, C),
      wqkv_p, bqkv_p.reshape(1, 3 * Cp), wout_p, bout.reshape(1, C),
      bk_p.astype(x.dtype), bv_p.astype(x.dtype),
      bias, cos, sin, fh)
    return out[:, :T].reshape(B, T * L, C)


def _block_xla_tl(x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v,
                  key_valid, num_heads, T, L, t_logical, attend=None):
    """Exact twin of the padded-frames blocked call on the REAL rows: slice
    to the t_logical real frames, run the unpadded composition (bias token
    roped at position t_logical), zero-pad back. Pad-frame rows never feed
    real rows in any trunk stage (masked as keys, independent as queries),
    so the zero-vs-garbage difference there is unobservable and the VJP
    through this twin is exact for every differentiable input."""
    if t_logical is None or t_logical == T:
        return _block_xla(x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v,
                          key_valid, num_heads, T, L, attend=attend)
    B, N, C = x.shape
    TL = t_logical
    xr = x.reshape(B, T, L, C)[:, :TL].reshape(B, TL * L, C)
    out = _block_xla(xr, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v,
                     key_valid[:, :, :TL], num_heads, TL, L, attend=attend)
    out = out.reshape(B, TL, L, C)
    return jnp.pad(out, ((0, 0), (0, T - TL), (0, 0), (0, 0))).reshape(B, N, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15))
def _time_block_pallas_blocked(x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k,
                               bias_v, key_valid, num_heads, T, L,
                               interpret=False, t_logical=None):
    return _block_pallas_fwd_blocked(x, sh, sc, g, wqkv, bqkv, wout, bout,
                                     bias_k, bias_v, key_valid, num_heads, T, L,
                                     interpret=interpret, t_logical=t_logical)


def _tbb_fwd(x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v, key_valid,
             num_heads, T, L, interpret, t_logical):
    res = (x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v, key_valid)
    return _block_pallas_fwd_blocked(x, sh, sc, g, wqkv, bqkv, wout, bout,
                                     bias_k, bias_v, key_valid, num_heads, T, L,
                                     interpret=interpret,
                                     t_logical=t_logical), res


def _blocked_bwd_fits(qrows: int, TK: int) -> bool:
    """The hand-fused blocked backward keeps every head group's (gh*rows, TK)
    logit/probability surfaces resident at once (no query-block loop): gate
    it to shapes whose per-program working set stays well under VMEM. ATLAS
    (256 x 264) fits; T=1000 (1000 x 1008) does not and keeps the XLA-twin
    route (whose attention core engages the flash kernel at M >= 512)."""
    return qrows * TK <= 131072


def _tbb_bwd(num_heads, T, L, interpret, t_logical, res, grad):
    import os

    Tp = -(-T // 8) * 8
    if (os.environ.get("MDGEN_BLOCKED_BWD", "") != "xla"
            and _blocked_bwd_fits(Tp, Tp + 8)):
        # hand-fused blocked backward (ops/blocked_block_bwd.py): one
        # program per (b, residue) recomputing the block forward and
        # accumulating weight grads across the sequential grid — the XLA
        # twin's backward spilled the full rope/logit surfaces to HBM
        # (~230 of the 292 ms ATLAS train step, r4 profile)
        from .blocked_block_bwd import time_block_bwd

        return time_block_bwd(*res, grad, num_heads, T, L, interpret,
                              t_logical) + (None,)

    from .fused_attention import fused_attention

    # A/B fallback: the XLA-twin VJP with the dispatcher-gated flash core
    # (engages at M >= 512; forcing it below the gate measured 292 -> 314
    # ms at ATLAS — tiny programs lose to the batched GEMM)
    att = lambda q, k, v, bk, bv, kv, H: _xla_impl(
        q, k, v, bk, bv, kv, H,
        attend=functools.partial(fused_attention, base2=True))
    _, vjp = jax.vjp(
        lambda *a: _block_xla_tl(*a, num_heads, T, L, t_logical, attend=att),
        *res)
    grads = vjp(grad)
    return grads[:10] + (None,)


_time_block_pallas_blocked.defvjp(_tbb_fwd, _tbb_bwd)


@functools.partial(jax.jit, static_argnames=("num_heads", "T", "L", "interpret",
                                              "probes"))
def _block_pallas_fwd_blocked_rows(x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k,
                                   bias_v, key_valid, num_heads: int, T: int,
                                   L: int, interpret: bool = False,
                                   probes: str = ""):
    """Transpose-free residue-stage routing for large L: the trunk layout
    (B, T*L, C) has each frame's L residue rows CONTIGUOUS (row t*L + l), so
    a free reshape to (B, T, L, C) + a rank-4 BlockSpec feeds the blocked
    whole-block kernel one frame per program over grid (B, T) — attention
    over residues (reference src/mdgen/model/latent_model.py:466-472) with
    zero physical activation transposes. Replaces the swap-axes routing
    (two (B,T,L,C)<->(B,L,T,C) transposes per layer, ~0.8 ms/layer of
    reshape+copy at ATLAS crop-256, r3 device profile). ``key_valid`` is
    mask (B, T, L): 1 = attendable residue of frame t."""
    import os

    B, N, C = x.shape
    H = num_heads
    D = C // H
    Lp = -(-L // 8) * 8
    TK = Lp + 8
    Dp = D if (128 % D == 0 or TK > 512
               or os.environ.get("MDGEN_BLOCKED_COMPACT", "")) else 32
    Cp = H * Dp

    x4 = x.reshape(B, T, L, C)

    bias = (key_valid.astype(jnp.float32) - 1.0) * -_NEG_INF  # (B, T, L)
    tail = jnp.full((B, T, TK - L), _NEG_INF, jnp.float32)
    tail = tail.at[:, :, Lp - L].set(0.0)
    bias = jnp.concatenate([bias, tail], axis=2).reshape(B * T, 1, TK)

    tq = _blocked_tq(Lp, TK, max(C, Cp), budget=11 * 1024 * 1024)
    Lp2 = -(-Lp // tq) * tq
    if Lp2 != L:
        x4 = jnp.pad(x4, ((0, 0), (0, 0), (0, Lp2 - L), (0, 0)))

    if Dp != D:
        wqkv_p = jnp.pad(wqkv.reshape(C, 3, H, D),
                         ((0, 0), (0, 0), (0, 0), (0, Dp - D))).reshape(C, 3 * Cp)
        bqkv_p = jnp.pad(bqkv.reshape(3, H, D),
                         ((0, 0), (0, 0), (0, Dp - D))).reshape(3 * Cp)
        wout_p = jnp.pad(wout.reshape(H, D, C),
                         ((0, 0), (0, Dp - D), (0, 0))).reshape(Cp, C)
        bk_p = jnp.pad(bias_k.reshape(H, D), ((0, 0), (0, Dp - D))).reshape(1, Cp)
        bv_p = jnp.pad(bias_v.reshape(H, D), ((0, 0), (0, Dp - D))).reshape(1, Cp)
    else:
        wqkv_p, bqkv_p, wout_p = wqkv, bqkv, wout
        bk_p, bv_p = bias_k.reshape(1, C), bias_v.reshape(1, C)

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
        t = np.concatenate([ext_q, np.tile(base[L:L + 1], (8, 1))], axis=0)
        if Lp2 + 8 > TK:
            t = np.concatenate([t, np.tile(t[-1:], (Lp2 + 8 - TK, 1))], axis=0)
        return t

    cos = jnp.asarray(table(cos_np), jnp.float32)
    sin = jnp.asarray(table(sin_np), jnp.float32)
    fh = jnp.asarray(fh_np, jnp.float32).reshape(1, Cp)

    out = pl.pallas_call(
        functools.partial(_block_kernel_blocked, num_heads=num_heads, head_dim=D,
                          tq=tq, kq=Lp, pad_dim=Dp if Dp != D else 0,
                          probes=probes),
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, Lp2, C), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((C, 3 * Cp), lambda b, t: (0, 0)),
            pl.BlockSpec((1, 3 * Cp), lambda b, t: (0, 0)),
            pl.BlockSpec((Cp, C), lambda b, t: (0, 0)),
            pl.BlockSpec((1, C), lambda b, t: (0, 0)),
            pl.BlockSpec((1, Cp), lambda b, t: (0, 0)),
            pl.BlockSpec((1, Cp), lambda b, t: (0, 0)),
            pl.BlockSpec((1, 1, TK), lambda b, t, T=T: (b * T + t, 0, 0)),
            pl.BlockSpec((max(TK, Lp2 + 8), Cp), lambda b, t: (0, 0)),
            pl.BlockSpec((max(TK, Lp2 + 8), Cp), lambda b, t: (0, 0)),
            pl.BlockSpec((1, Cp), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, Lp2, C), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, Lp2, C), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
    )(x4, sh.reshape(B, 1, C), sc.reshape(B, 1, C), g.reshape(B, 1, C),
      wqkv_p, bqkv_p.reshape(1, 3 * Cp), wout_p, bout.reshape(1, C),
      bk_p.astype(x.dtype), bv_p.astype(x.dtype),
      bias, cos, sin, fh)
    if Lp2 != L:
        out = out[:, :, :L]
    return out.reshape(B, T * L, C)


def _res_rows_xla(x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v,
                  key_valid, num_heads, T, L, attend=None):
    """XLA twin of the rows routing (= the swap-axes composition it
    replaces): parity target and custom-VJP backward."""
    B, N, C = x.shape
    xs = x.reshape(B, T, L, C).transpose(0, 2, 1, 3).reshape(B, L * T, C)
    out = _block_xla(xs, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v,
                     key_valid, num_heads, L, T, attend=attend)
    return out.reshape(B, L, T, C).transpose(0, 2, 1, 3).reshape(B, N, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14))
def _res_rows_block_pallas(x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k,
                           bias_v, key_valid, num_heads, T, L, interpret=False):
    return _block_pallas_fwd_blocked_rows(x, sh, sc, g, wqkv, bqkv, wout, bout,
                                          bias_k, bias_v, key_valid, num_heads,
                                          T, L, interpret=interpret)


def _rr_fwd(x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v, key_valid,
            num_heads, T, L, interpret):
    res = (x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v, key_valid)
    return _block_pallas_fwd_blocked_rows(
        x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v, key_valid,
        num_heads, T, L, interpret=interpret), res


def _rr_bwd(num_heads, T, L, interpret, res, grad):
    import os

    Lp = -(-L // 8) * 8
    if (os.environ.get("MDGEN_BLOCKED_BWD", "") != "xla"
            and _blocked_bwd_fits(Lp, Lp + 8)):
        # hand-fused blocked backward, one program per (b, frame) — see
        # _tbb_bwd
        from .blocked_block_bwd import rows_block_bwd

        return rows_block_bwd(*res, grad, num_heads, T, L, interpret) + (None,)

    from .fused_attention import fused_attention

    # A/B fallback: XLA-twin VJP with the dispatcher-gated flash core
    att = lambda q, k, v, bk, bv, kv, H: _xla_impl(
        q, k, v, bk, bv, kv, H,
        attend=functools.partial(fused_attention, base2=True))
    _, vjp = jax.vjp(
        lambda *a: _res_rows_xla(*a, num_heads, T, L, attend=att), *res)
    grads = vjp(grad)
    return grads[:10] + (None,)


_res_rows_block_pallas.defvjp(_rr_fwd, _rr_bwd)


def _rows_frame_sharded(args, num_heads, T, L, interp):
    """Frame-sharded rows-kernel execution for batch < mesh: dim 0 rides the
    leading mesh axes that divide B, the frame axis the rest (ATLAS B=1 on
    a v5e-8 runs the kernel sharded over all 8 chips). Per-frame residue
    attention is embarrassingly parallel over T and the rope tables are
    residue-positional, so the local call on a frame chunk is EXACT — XLA
    inserts the boundary resharding (the Ulysses-style factorization,
    SURVEY §2.7). Returns None when nothing divides."""
    from ..parallel.kernel_sharding import shard_map_batch_seq

    x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v, mask = args
    B, N, C = x.shape

    def local(x3, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, mask):
        Bl, Tl, _ = x3.shape
        out = _res_rows_block_pallas(
            x3.reshape(Bl, Tl * L, C), sh, sc, g, wqkv, bqkv, wout, bout,
            bk, bv, mask, num_heads, Tl, L, interp)
        return out.reshape(Bl, Tl, L * C)

    out = shard_map_batch_seq(
        local, (1, "b", "b", "b", None, None, None, None, None, None, 1),
        x.reshape(B, T, L * C), sh, sc, g, wqkv, bqkv, wout, bout,
        bias_k, bias_v, mask, seq_dim_size=T)
    return None if out is None else out.reshape(B, N, C)


def residue_rows_block(x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v,
                       mask, *, num_heads: int, tl: tuple,
                       force_xla: bool = False, force_pallas: bool = False):
    """Large-L residue-attention stage in trunk layout: x (B, T*L, C), mask
    (B, T, L). One frame per program over grid (B, T) — no activation
    transpose. Falls back to the swap-axes routing (`time_attention_block`
    on the transposed layout) where the kernel cannot hold a frame's rows,
    and to the XLA composition off-TPU."""
    import os

    from ..parallel.kernel_sharding import get_kernel_mesh, shard_map_batch0

    T, L = tl
    B, N, C = x.shape
    env = os.environ.get("MDGEN_RES_ROWS", "")  # "xla"/"swap" | "rows" A/B
    force_xla = force_xla or env in ("xla", "swap")
    force_pallas = force_pallas or env == "rows"
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = force_pallas or (
        not force_xla and on_tpu and C % 128 == 0 and _blocked_fits(L, C))
    if use_pallas:
        interp = not on_tpu

        def local(*a):
            return _res_rows_block_pallas(*a, num_heads, T, L, interp)

        args = (x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v, mask)
        batched = (True,) * 4 + (False,) * 6 + (True,)
        if jax.device_count() > 1 or get_kernel_mesh() is not None:
            out = shard_map_batch0(local, batched, *args)
            if out is None:
                # batch < mesh (ATLAS B=1): shard the FRAME axis — the rows
                # kernel grids over frames and every frame's residue
                # attention is independent, so each device runs the kernel
                # on its local frame chunk (VERDICT r3 weak #4)
                out = _rows_frame_sharded(args, num_heads, T, L, interp)
            if out is not None:
                return out
            if not force_pallas:
                # uneven shard both ways: fall back to the swap-axes routing
                # below (time_attention_block), which keeps the blocked
                # attention kernel engaged through its own dispatcher —
                # mirroring time_attention_block's analogous fallback
                # instead of dropping to the pure-XLA composition.
                pass
            else:
                return local(*args)
        else:
            return local(*args)
    # swap-axes routing (the pre-r3s3 path): ONE activation transpose each
    # way around the lane-blocked kernel
    xs = x.reshape(B, T, L, C).transpose(0, 2, 1, 3).reshape(B, L * T, C)
    xs = time_attention_block(xs, sh, sc, g, wqkv, bqkv, wout, bout, bias_k,
                              bias_v, mask, num_heads=num_heads, tl=(L, T),
                              force_xla=force_xla)
    return xs.reshape(B, L, T, C).transpose(0, 2, 1, 3).reshape(B, N, C)


def _blocked_vmem_fixed(Tp: int, TK: int, C: int) -> int:
    """Per-program resident bytes independent of the query-block size: the
    full q and out slices (double-buffered bf16), kb/vb (double-buffered),
    and the roped-K + transpose + rope f32 temporaries."""
    return 4 * Tp * C * 2 + 4 * TK * C * 2 + 2 * TK * C * 4


def _blocked_tq(Tp: int, TK: int, C: int, budget: int = 13 * 1024 * 1024):
    """Query block (multiple of 8) sized so the resident slices plus the
    (Gh*tq, TK) f32 logits/probs fit VMEM; Tp is padded UP to a multiple of
    the choice by the caller."""
    Gh = 5  # worst-case heads per group at D=24; close enough for sizing
    for tq in (256, 128, 64, 32, 16, 8):
        if tq > Tp:  # don't pad the whole query dim up to an oversized block
            continue
        est = _blocked_vmem_fixed(Tp, TK, C) + 2 * (Gh * tq) * TK * 4
        if est <= budget:
            return tq
    return 8


def _blocked_fits(T: int, C: int) -> bool:
    Tp = -(-T // 8) * 8
    TK = Tp + 8
    return _blocked_vmem_fixed(Tp, TK, C) + 2 * (5 * 8) * TK * 4 <= 13 * 1024 * 1024


# ---------------------------------------------------------------------------
def _xla_impl(q, k, v, bias_k, bias_v, key_valid, num_heads: int,
              attend=None, base2: bool = False):
    """Reference composition: transpose to (B*L, T, ...), bias append, rope,
    masked softmax attention, transpose back. Used on CPU, at large L/T, and
    as the VJP backward of the Pallas forward. ``attend`` swaps the
    attention core (default XLA batched-GEMM; the long-T VJP passes the
    flash kernel so the backward never materializes (B*L*H, T, T) logits)."""
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
    if attend is None:
        core = functools.partial(_attention_xla, base2=base2)
    else:
        core = attend
    out = core(qh, kh, vh, valid)  # (B*L, H, T, D)
    out = out.transpose(0, 2, 1, 3).reshape(B, L, T, C).transpose(0, 2, 1, 3)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _time_attention_pallas(q, k, v, bias_k, bias_v, key_valid, num_heads,
                           interpret=False, base2=False):
    return _pallas_fwd(q, k, v, bias_k, bias_v, key_valid, num_heads,
                       interpret=interpret, base2=base2)


def _ta_fwd(q, k, v, bias_k, bias_v, key_valid, num_heads, interpret, base2):
    return (_pallas_fwd(q, k, v, bias_k, bias_v, key_valid, num_heads,
                        interpret=interpret, base2=base2),
            (q, k, v, bias_k, bias_v, key_valid))


def _ta_bwd(num_heads, interpret, base2, res, g):
    from .fused_attention import fused_attention

    q, k, v, bias_k, bias_v, key_valid = res
    # flash core: self-routing — at short T it takes the XLA batched-GEMM
    # path (identical to the old backward); at long T it uses the Pallas
    # flash fwd + custom-VJP bwd, so differentiating the blocked long-T
    # forward no longer materializes the (B*L*H, T, T) logit gradients
    # (r3: T=1000 B=2 grad-ckpt train step 72.6 -> see PERF.md)
    _, vjp = jax.vjp(
        lambda *a: _xla_impl(
            *a, num_heads,
            attend=functools.partial(fused_attention, base2=base2)),
        q, k, v, bias_k, bias_v, key_valid)
    dq, dk, dv, dbk, dbv, _ = vjp(g)
    return dq, dk, dv, dbk, dbv, None


_time_attention_pallas.defvjp(_ta_fwd, _ta_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _time_attention_pallas_blocked(q, k, v, bias_k, bias_v, key_valid, num_heads,
                                   interpret=False, base2=False):
    return _pallas_fwd_blocked(q, k, v, bias_k, bias_v, key_valid, num_heads,
                               interpret=interpret, base2=base2)


def _tab_fwd(q, k, v, bias_k, bias_v, key_valid, num_heads, interpret, base2):
    return (_pallas_fwd_blocked(q, k, v, bias_k, bias_v, key_valid, num_heads,
                                interpret=interpret, base2=base2),
            (q, k, v, bias_k, bias_v, key_valid))


_time_attention_pallas_blocked.defvjp(_tab_fwd, _ta_bwd)


def time_attention(q, k, v, bias_k, bias_v, key_valid=None, *, num_heads: int,
                   force_xla: bool = False, force_pallas: bool = False,
                   base2: bool = False):
    """Frame attention in (B, T, L, C) layout: attends over T, batch (B, L).

    q pre-scaled by head_dim**-0.5 and already projected; k, v projected;
    bias_k/bias_v (1, 1, C) or (C,); key_valid (B, L, T) with 1 = attendable
    (the bias token is always attendable). Returns (B, T, L, C) pre-out-proj.
    ``base2``: q additionally carries LOG2E and softmax runs via exp2 (the
    folded-weight family's contract — see module docstring).
    """
    import os

    from ..parallel.kernel_sharding import get_kernel_mesh, shard_map_batch0

    B, T, L, C = q.shape
    if key_valid is None:
        key_valid = jnp.ones((B, L, T), jnp.float32)
    env = os.environ.get("MDGEN_TIME_ATTENTION", "")  # "xla" | "pallas" A/B override
    force_xla = force_xla or env == "xla"
    force_pallas = force_pallas or env == "pallas"
    on_tpu = jax.default_backend() == "tpu" and C % 128 == 0
    interp = jax.default_backend() != "tpu"
    multi = jax.device_count() > 1 or get_kernel_mesh() is not None

    def dispatch(local, fallback):
        # multi-device: shard_map over the batch dim (each device runs the
        # kernel on its local shard); single device calls the kernel directly
        if multi:
            out = shard_map_batch0(local, (True, True, True, False, False, True),
                                   q, k, v, bias_k, bias_v, key_valid)
            if out is not None:
                return out
            if not force_pallas:
                return fallback()
        return local(q, k, v, bias_k, bias_v, key_valid)

    if force_pallas or (not force_xla and on_tpu and L <= MAX_L and T <= MAX_T):
        return dispatch(
            lambda q, k, v, bk, bv, kv: _time_attention_pallas(
                q, k, v, bk, bv, kv, num_heads, interp, base2),
            lambda: _xla_impl(q, k, v, bias_k, bias_v, key_valid, num_heads,
                              base2=base2),
        )
    if (env == "blocked" or (not force_xla and on_tpu and (L > MAX_L or T > MAX_T))) \
            and _blocked_fits(T, C):
        # blocked variant (full roped K/V per (b, residue) in VMEM, grid
        # (B, L), internal query-block loop): serves large L (ATLAS) and long
        # T (the reference's flagship T=1000 forward-sim config) — the r3
        # rewrite ropes K once per (b, r), fixing the r2 re-rope overhead
        # that made T=1000 lose to the flash path
        return dispatch(
            lambda q, k, v, bk, bv, kv: _time_attention_pallas_blocked(
                q, k, v, bk, bv, kv, num_heads, interp, base2),
            lambda: _xla_impl(q, k, v, bias_k, bias_v, key_valid, num_heads,
                              base2=base2),
        )
    return _xla_impl(q, k, v, bias_k, bias_v, key_valid, num_heads, base2=base2)


# ---------------------------------------------------------------------------
# Fused frame-attention BLOCK: LN + modulate + qkv-projection + attention +
# out-projection + gate + residual in one VMEM pass per batch element.
# ---------------------------------------------------------------------------

_LN_EPS = 1e-6


def _block_kernel(x_ref, sh_ref, sc_ref, g_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                  bk_ref, bv_ref, bias_ref, cos_ref, sin_ref, fh_ref, o_ref,
                  *, num_heads: int, head_dim: int, channels: int):
    """Per program (one batch element): for each residue slice x_r of the
    (Tp, L*C) activation — LayerNorm (f32 lane stats), AdaLN modulate, one
    (C -> 3C) qkv matmul with the weights resident in VMEM, in-kernel RoPE,
    grouped-stack attention (_grouped_attend), out-projection, gate +
    residual — reading and writing the activation exactly once."""
    C, H, D = channels, num_heads, head_dim
    Tp = x_ref.shape[1]
    LC = x_ref.shape[2]
    L = LC // C
    half = D // 2

    fh = fh_ref[...]  # (1, C)
    sh = sh_ref[0].astype(jnp.float32)  # (1, C)
    sc = sc_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    wqkv = wqkv_ref[...]
    bqkv = bqkv_ref[...].astype(jnp.float32)
    wout = wout_ref[...]
    bout = bout_ref[...].astype(jnp.float32)

    def rotate_half(x32):
        take_right = pltpu.roll(x32, C - half, 1)
        take_left = pltpu.roll(x32, half, 1)
        return -take_right * fh + take_left * (1 - fh)

    def rope(x, n0, n):
        cos = cos_ref[pl.ds(n0, n)].astype(jnp.float32)
        sin = sin_ref[pl.ds(n0, n)].astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        return (x32 * cos + rotate_half(x32) * sin).astype(x.dtype)

    bk_blk = rope(jnp.broadcast_to(bk_ref[...], (8, C)), Tp, 8)
    bv_blk = jnp.broadcast_to(bv_ref[...], (8, C))

    x = x_ref[0]  # (Tp, LC)
    for r in range(L):
        xr = x[:, r * C:(r + 1) * C]  # (Tp, C)
        x32 = xr.astype(jnp.float32)
        mean = jnp.mean(x32, axis=1, keepdims=True)
        var = jnp.mean(x32 * x32, axis=1, keepdims=True) - mean * mean
        h = (x32 - mean) * jax.lax.rsqrt(var + _LN_EPS)
        h = (h * (1.0 + sc) + sh).astype(xr.dtype)
        qkv = jax.lax.dot_general(
            h, wqkv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + bqkv  # (Tp, 3C) f32
        qkv = qkv.astype(xr.dtype)
        q_r = rope(qkv[:, :C], 0, Tp)
        k_r = rope(qkv[:, C:2 * C], 0, Tp)
        v_r = qkv[:, 2 * C:]
        kb_r = jnp.concatenate([k_r, bk_blk.astype(k_r.dtype)], axis=0)
        vb_r = jnp.concatenate([v_r, bv_blk.astype(v_r.dtype)], axis=0)
        bias = bias_ref[0, r:r + 1, :]  # (1, TK)
        # base2: the block family's wqkv carries scale * LOG2E (module note)
        att = _grouped_attend(q_r, kb_r.T, vb_r, bias, H, D, base2=True)  # (Tp, C) f32
        y = jax.lax.dot_general(
            att.astype(xr.dtype), wout, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bout  # (Tp, C) f32
        o_ref[0, :, r * C:(r + 1) * C] = (x32 + g * y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "T", "L", "interpret"))
def _block_pallas_fwd(x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v, key_valid,
                      num_heads: int, T: int, L: int, interpret: bool = False):
    B, N, C = x.shape
    D = C // num_heads
    Tp = -(-T // 8) * 8
    TK = Tp + 8

    x = x.reshape(B, T, L * C)
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    bias = (key_valid.astype(jnp.float32) - 1.0) * -_NEG_INF  # (B, L, T)
    tail = jnp.full((B, L, TK - T), _NEG_INF, jnp.float32)
    tail = tail.at[:, :, Tp - T].set(0.0)
    bias = jnp.concatenate([bias, tail], axis=2)

    cos_np, sin_np, fh_np = _rope_tables_np(T + 1, D, C)

    def table(base):
        ext_q = base[list(range(T)) + [T - 1] * (Tp - T)] if Tp != T else base[:T]
        return np.concatenate([ext_q, np.tile(base[T:T + 1], (8, 1))], axis=0)

    cos = jnp.asarray(table(cos_np), jnp.float32)
    sin = jnp.asarray(table(sin_np), jnp.float32)
    fh = jnp.asarray(fh_np, jnp.float32).reshape(1, C)

    out = pl.pallas_call(
        functools.partial(_block_kernel, num_heads=num_heads, head_dim=D, channels=C),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Tp, L * C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((C, 3 * C), lambda b: (0, 0)),
            pl.BlockSpec((1, 3 * C), lambda b: (0, 0)),
            pl.BlockSpec((C, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((1, L, TK), lambda b: (b, 0, 0)),
            pl.BlockSpec((TK, C), lambda b: (0, 0)),
            pl.BlockSpec((TK, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Tp, L * C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Tp, L * C), x.dtype),
        interpret=interpret,
    )(x, sh.reshape(B, 1, C), sc.reshape(B, 1, C), g.reshape(B, 1, C),
      wqkv, bqkv.reshape(1, 3 * C), wout, bout.reshape(1, C),
      bias_k.reshape(1, C).astype(x.dtype), bias_v.reshape(1, C).astype(x.dtype),
      bias, cos, sin, fh)
    return out[:, :T].reshape(B, T * L, C)


def _block_xla(x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v, key_valid,
               num_heads, T, L, attend=None):
    """Reference composition of the whole block (CPU path and VJP backward):
    exactly the flax layer's stage — modulate(LN(x)) -> fused qkv projection
    -> time_attention XLA composition -> out projection -> x + g * y.
    ``attend`` overrides the attention core (``_block_dispatch`` routes it
    through the kernel dispatcher for shapes the fused block cannot hold)."""
    B, N, C = x.shape
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    h = ((x32 - mean) * jax.lax.rsqrt(var + _LN_EPS)).astype(x.dtype)
    h = h * (1 + sc[:, None]) + sh[:, None]
    qkv = h @ wqkv.astype(h.dtype) + bqkv.astype(h.dtype)
    q, k, v = (a.reshape(B, T, L, C) for a in
               (qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]))
    if attend is None:
        attend = functools.partial(_xla_impl, base2=True)
    out = attend(q, k, v, bias_k, bias_v, key_valid, num_heads)
    y = out.reshape(B, N, C) @ wout.astype(x.dtype) + bout.astype(x.dtype)
    return x + g[:, None] * y


def _dispatch_attend(num_heads):
    """Attention core routed through the ``time_attention`` kernel
    dispatcher (the `_block_dispatch` core, reusable with `_block_xla_tl`)."""
    return lambda q, k, v, bk, bv, kv, H: time_attention(
        q, k, v, bk, bv, kv, num_heads=H, base2=True)


def _block_dispatch(x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v, key_valid,
                    num_heads, T, L):
    """The block composition with the attention core routed through the
    ``time_attention`` dispatcher — on TPU the blocked grouped-stack kernel
    engages for long T / large L where the fused whole-block kernel cannot
    hold the activation in VMEM (reference flagship T=1000 forward-sim,
    README.md:50-56)."""
    return _block_xla(
        x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v, key_valid,
        num_heads, T, L,
        attend=lambda q, k, v, bk, bv, kv, H: time_attention(
            q, k, v, bk, bv, kv, num_heads=H, base2=True),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14))
def _time_block_pallas(x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v, key_valid,
                       num_heads, T, L, interpret=False):
    return _block_pallas_fwd(x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v,
                             key_valid, num_heads, T, L, interpret=interpret)


def _tb_fwd(x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v, key_valid,
            num_heads, T, L, interpret):
    res = (x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v, key_valid)
    return _block_pallas_fwd(x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v,
                             key_valid, num_heads, T, L, interpret=interpret), res


def _tb_bwd(num_heads, T, L, interpret, res, grad):
    _, vjp = jax.vjp(lambda *a: _block_xla(*a, num_heads, T, L), *res)
    grads = vjp(grad)
    return grads[:10] + (None,)


_time_block_pallas.defvjp(_tb_fwd, _tb_bwd)


def _time_residue_sharded(args, num_heads, T, L, interp, t_logical, blocked):
    """Residue-sharded fused-block execution for batch < mesh: frame
    attention is independent across residues (the kernel grids over (B, L)),
    so each device runs the kernel on its local residue chunk with the FULL
    frame axis — no gathered keys needed; rope is frame-positional and the
    t_logical bias-token position is chunk-invariant, so the local call is
    EXACT (VERDICT r3 weak #4). Returns None when nothing divides."""
    from ..parallel.kernel_sharding import shard_map_batch_seq

    x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v, kv = args
    B, N, C = x.shape

    def local(x4, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, kv):
        Bl, T_, Ll, C_ = x4.shape
        xl = x4.reshape(Bl, T_ * Ll, C_)
        if blocked:
            out = _time_block_pallas_blocked(xl, sh, sc, g, wqkv, bqkv, wout,
                                             bout, bk, bv, kv, num_heads, T_,
                                             Ll, interp, t_logical)
        else:
            out = _time_block_pallas(xl, sh, sc, g, wqkv, bqkv, wout, bout,
                                     bk, bv, kv, num_heads, T_, Ll, interp)
        return out.reshape(Bl, T_, Ll, C_)

    out = shard_map_batch_seq(
        local, (2, "b", "b", "b", None, None, None, None, None, None, 1),
        x.reshape(B, T, L, C), sh, sc, g, wqkv, bqkv, wout, bout,
        bias_k, bias_v, kv, seq_dim_size=L)
    return None if out is None else out.reshape(B, N, C)


def time_attention_block(x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v,
                         key_valid, *, num_heads: int, tl: tuple,
                         force_xla: bool = False, force_pallas: bool = False,
                         t_logical: int = None):
    """x (B, T*L, C) raw (pre-LN); sh/sc/g (B, C) AdaLN vectors; wqkv (C, 3C)
    with head_dim**-0.5 * LOG2E folded into the q columns (base-2 softmax
    contract, module docstring); key_valid (B, L, T). Returns
    x + g * out_proj(attend(qkv(modulate(LN(x))))). ``t_logical``: real
    frame count when x arrives frame-padded to T (padded-trunk modular
    routing) — the blocked kernel handles the pad natively; every other
    path slices to the real frames and zero-pads back."""
    import os

    from ..parallel.kernel_sharding import get_kernel_mesh, shard_map_batch0

    T, L = tl
    B, N, C = x.shape
    if t_logical is not None and t_logical == T:
        t_logical = None
    env = os.environ.get("MDGEN_TIME_BLOCK", "")
    force_xla = force_xla or env == "xla"
    force_pallas = force_pallas or env == "pallas"
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = t_logical is None and (force_pallas or (
        not force_xla and on_tpu and C % 128 == 0 and L <= MAX_L and T <= MAX_T
    ))
    args = (x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v, key_valid)
    interp = not on_tpu
    batched = (True, True, True, True, False, False, False, False, False, False, True)
    multi = jax.device_count() > 1 or get_kernel_mesh() is not None
    if use_pallas:
        def local(x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, kv):
            return _time_block_pallas(x, sh, sc, g, wqkv, bqkv, wout, bout,
                                      bk, bv, kv, num_heads, T, L, interp)

        if multi:
            out = shard_map_batch0(local, batched, *args)
            if out is None:
                out = _time_residue_sharded(args, num_heads, T, L, interp,
                                            None, blocked=False)
            if out is not None:
                return out
            if not force_pallas:
                return _block_xla(*args, num_heads, T, L)
        return local(*args)
    use_blocked = env == "blocked" or (
        not force_xla and on_tpu and C % 128 == 0
        and (L > MAX_L or T > MAX_T or t_logical is not None)
        and _blocked_fits(T, C) and env != "dispatch")
    if use_blocked:
        # blocked whole-block kernel (grid (B, L), internal query-block
        # loop): the modular composition's per-layer pads / projected-tensor
        # materializations / f32 LN converts never leave VMEM — ATLAS fwd
        # 38.3 -> see PERF.md r3
        def local_b(x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, kv):
            return _time_block_pallas_blocked(x, sh, sc, g, wqkv, bqkv, wout,
                                              bout, bk, bv, kv, num_heads, T, L,
                                              interp, t_logical)

        if multi:
            out = shard_map_batch0(local_b, batched, *args)
            if out is None:
                out = _time_residue_sharded(args, num_heads, T, L, interp,
                                            t_logical, blocked=True)
            if out is not None:
                return out
            if not force_pallas:
                return _block_xla_tl(*args, num_heads, T, L, t_logical,
                                     attend=_dispatch_attend(num_heads))
        return local_b(*args)
    if on_tpu and not force_xla:
        # fused block ineligible: still route the attention core through the
        # kernel dispatcher
        return _block_xla_tl(*args, num_heads, T, L, t_logical,
                             attend=_dispatch_attend(num_heads))
    return _block_xla_tl(*args, num_heads, T, L, t_logical)
