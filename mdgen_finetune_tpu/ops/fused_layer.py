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

from .adaln_mlp import _gelu_fast
from .adaln_mlp import _xla_impl as _mlp_xla
from .residue_attention import _tables_np as _res_tables_np
from .residue_attention import _xla_impl as _res_xla
from .time_attention import MAX_L, MAX_T, _block_xla, _grouped_attend
from .time_attention import _rope_tables_np as _time_tables_np

_NEG_INF = -1e9
_LN_EPS = 1e-6


def _kernel(x_ref, mod_ref, *refs, num_heads: int, head_dim: int, channels: int,
            stages: str = "123", num_layers: int = 1, stream_layers: int = 0,
            fold_final: bool = False, fold_embed: bool = False,
            has_enc: bool = False, step_dt=None, s1_merged: bool = False,
            ode_steps: int = 1):
    """Row-stacked layout: the (Tp, L*C) input is restacked ONCE to
    (L*Tp, C) so every projection / out-proj / MLP matmul runs as a single
    MXU op with M = L*Tp rows — the r2 per-residue loop ran each matmul at
    M = Tp (~40% MFU at the bench shape; the device-op profile showed the
    kernel itself was 4.0 of the 4.5 ms forward). LN + modulate and gates
    are single passes over the stacked rows; only RoPE (per-residue
    constants) and the attention cores keep per-residue row-block loops.

    Trunk streaming (``stream_layers = NL > 0``): grid (B, NL), ONE layer
    per program — program (b, i) streams layer i's weights through its
    BlockSpec (Mosaic double-buffers the weight DMA against compute) while
    the activation persists in a VMEM scratch across the i steps, so the
    inter-layer trunk never touches HBM and the restack/unstack happens
    once per batch element. A weights-resident variant (all NL layers'
    weights in VMEM, one program per b) measured 3.70 vs 3.41 ms — weight
    residency defeats Mosaic's pipelining; streaming is the right TPU
    shape (r3; reference trunk loop src/mdgen/model/latent_model.py:456-493).
    ``num_layers > 1`` without streaming keeps that resident variant for
    interpret-mode reference.
    """
    C, H, D = channels, num_heads, head_dim
    NL = num_layers
    NLt = stream_layers
    if fold_final:
        modf_ref, wfin_ref, bfin_ref, *refs = refs
    if fold_embed:
        # ODE-scan fold (flat-latent fast path): x_ref is the f32 carry
        # (1, Tp, L*P); the first program embeds it (per-residue latent
        # projection + the precomputed per-step-constant add + the encoder
        # row), and with ``step_dt`` the last program emits
        # x + dt * head_out — the whole euler step is ONE pallas_call
        wlat_ref, cadd_ref, *refs = refs
        if has_enc:
            enc_ref, *refs = refs
    (wqkv_l_ref, bqkv_l_ref, wout_l_ref, bout_l_ref,
     wqkv_t_ref, bqkv_t_ref, wout_t_ref, bout_t_ref,
     w1_ref, b1_ref, w2_ref, b2_ref,
     bkl_ref, bvl_ref, bkt_ref, bvt_ref,
     bias_l_ref, bias_t_ref,
     cosr_ref, sinr_ref, cost_ref, sint_ref, fh_ref, fht_ref, s_ref, st_ref,
     o_ref, *rest) = refs
    S_steps = ode_steps
    if NLt:
        if S_steps > 1:
            *res_refs, xbuf, cbuf = rest
        else:
            *res_refs, xbuf = rest
            cbuf = None
        li_s = pl.program_id(1)  # over S_steps * NLt programs
        lq = li_s % NLt if S_steps > 1 else li_s  # layer index within a step
    else:
        res_refs = rest
    Tp = x_ref.shape[1]
    LC = cadd_ref.shape[2] if fold_embed else x_ref.shape[2]
    L = LC // C
    J = L + 1
    R = L * Tp
    half = D // 2
    dt = cadd_ref.dtype if fold_embed else x_ref.dtype

    fh = fh_ref[...]  # (1, C)

    def rotate_half(x32):
        take_right = pltpu.roll(x32, C - half, 1)
        take_left = pltpu.roll(x32, half, 1)
        return -take_right * fh + take_left * (1 - fh)

    def rope_res(x, pos):
        cos = cosr_ref[pos].astype(jnp.float32)  # (1, C)
        sin = sinr_ref[pos].astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        return (x32 * cos + rotate_half(x32) * sin).astype(x.dtype)

    # stage-2 tensors ride in a lane-PADDED head layout (Dp = 32 lanes per
    # head when D = 24; identity otherwise) so the grouped-stack matmuls run
    # on exact 128-lane tiles. The "c" probe runs the COMPACT layout
    # (Dp = D, even Gh-head groups) to measure the padding's projection-FLOP
    # cost (the qkv_t / out_t matmuls grow Cp/C-fold with padding) against
    # its core-tile alignment win. Pad lanes carry zeros (the padded rope
    # tables have cos = sin = 0 there).
    Dp = D if "c" in stages else (32 if 128 % D else D)
    Cp = H * Dp
    halfp = D // 2
    fht = fht_ref[...]  # (1, Cp)

    def rotate_half_t(x32):
        take_right = pltpu.roll(x32, Cp - halfp, 1)
        take_left = pltpu.roll(x32, halfp, 1)
        return -take_right * fht + take_left * (1 - fht)

    def rope_t(x, n0, n):
        cos = cost_ref[pl.ds(n0, n)].astype(jnp.float32)
        sin = sint_ref[pl.ds(n0, n)].astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        return (x32 * cos + rotate_half_t(x32) * sin).astype(x.dtype)

    def matmul(a, w, b):
        # (a bf16-emitting dot_general (preferred_element_type=dt, bias on
        # the narrow surface) CRASHES the TPU worker — Mosaic kernel fault,
        # measured r3; keep projections f32-accumulating with an explicit
        # cast)
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + b.astype(jnp.float32)

    def restack():
        x = x_ref[0]  # (Tp, LC) lanes -> (R, C) rows
        return jnp.concatenate([x[:, r * C:(r + 1) * C] for r in range(L)], axis=0)

    if NLt:
        def embed_from(src2d):
            # embed stage on the f32 carry: per-residue lane block
            # src[:, r*P:(r+1)*P] @ wlat (zero pad rows) -> bf16, + the
            # precomputed constant add (+ this step's encoder row) — same op
            # order and roundings as the XLA twin in denoiser._flat_call
            P = wlat_ref.shape[0]
            wl = wlat_ref[...]
            rows = []
            for r in range(L):
                hr = jax.lax.dot_general(
                    src2d[:, r * P:(r + 1) * P].astype(dt), wl,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dt) + cadd_ref[0][:, r * C:(r + 1) * C]
                if has_enc:
                    hr = hr + enc_ref[0, 0, 0:1, r * C:(r + 1) * C]
                rows.append(hr)
            return jnp.concatenate(rows, axis=0)

        # first layer of each euler step embeds the carry into the
        # persistent scratch: step 0 from the HBM input, later steps from
        # the in-VMEM inter-step carry (cbuf); later programs resume from it
        @pl.when(li_s == 0)
        def _():
            xbuf[...] = embed_from(x_ref[0]) if fold_embed else restack()

        if S_steps > 1:
            @pl.when(jnp.logical_and(lq == 0, li_s > 0))
            def _():
                xbuf[...] = embed_from(cbuf[...])

        X = xbuf[...]
    else:
        X = restack()

    def blk(a, r):
        return a[r * Tp:(r + 1) * Tp]

    S = s_ref[...]
    St = st_ref[...]

    for li in range(NL):
      # per-layer weight slices (leading NL dim; NL = 1 is the single-layer
      # whole-layer kernel, biases stored as (NL, 1, X) rows)
      wqkv_l, bqkv_l = wqkv_l_ref[li], bqkv_l_ref[li]
      wout_l, bout_l = wout_l_ref[li], bout_l_ref[li]
      wqkv_t, bqkv_t = wqkv_t_ref[li], bqkv_t_ref[li]
      wout_t, bout_t = wout_t_ref[li], bout_t_ref[li]
      w1, b1, w2, b2 = w1_ref[li], b1_ref[li], w2_ref[li], b2_ref[li]
      bkl, bvl = bkl_ref[li], bvl_ref[li]
      bkt, bvt = bkt_ref[li], bvt_ref[li]

      def modln(xs, j, _li=li):
        # LN (f32 lane stats, eps 1e-6) + AdaLN modulate with mod row j over
        # ALL stacked rows in one pass
        x32 = xs.astype(jnp.float32)
        if "l" in stages:  # perf probe: LN lane-stats cost (wrong values)
            h = x32
        else:
            mean = jnp.mean(x32, axis=1, keepdims=True)
            var = jnp.mean(x32 * x32, axis=1, keepdims=True) - mean * mean
            h = (x32 - mean) * jax.lax.rsqrt(var + _LN_EPS)
        sh = mod_ref[0, _li, j:j + 1, :].astype(jnp.float32)
        sc = mod_ref[0, _li, j + 1:j + 2, :].astype(jnp.float32)
        return (h * (1.0 + sc) + sh).astype(dt)

      def gatev(j, _li=li):
        return mod_ref[0, _li, j:j + 1, :].astype(jnp.float32)  # (1, C)

    # ---- stage 1: residue attention over L, rows as batch ----
    # Merged-over-EVERYTHING form (r3). The micro-op cost model
    # (tools/micro_ops.py) showed the kernel is bound by DEPENDENT chain
    # latency over many small MXU/VPU ops, while row-dim concats/tiles are
    # ~free. So the J per-key logit dots and J PV dots collapse into TWO
    # stacked matmuls over (J*R, ·) rows, and the softmax runs as ONE
    # exp2 over the stacked sheet — no max tree at all: wqkv_l's q columns
    # carry scale * LOG2E (denoiser._fold_fused_args contract), softmax is
    # shift-invariant, and exp2's overflow is capped statically
    # (exp2(min(l, 100)); sum <= J * 2^100 << f32 max) with an
    # epsilon-guarded denominator. Falls back to the per-j loop when the
    # stacked sheets would stress VMEM (large Tp * L).
      if "1" in stages:
        qkv = matmul(modln(X, 0), wqkv_l, bqkv_l).astype(dt)  # (R, 3C)
        if "a" not in stages:  # "a" ablates the attention core (perf probe)
            if "r" in stages:  # perf probe: stage-1 rope cost
                q_all = qkv[:, :C]
                ks = [blk(qkv, r)[:, C:2 * C] for r in range(L)]
            else:
                # rope ONCE over all stacked rows (residue-major, so the
                # per-residue table rows tile to (R, C) via free row
                # concats of broadcasts) — replaces 2L per-slice rope calls
                # with two full-surface applications (stage-2's pattern)
                cr = jnp.concatenate(
                    [jnp.broadcast_to(cosr_ref[r].astype(jnp.float32), (Tp, C))
                     for r in range(L)], axis=0)
                sr = jnp.concatenate(
                    [jnp.broadcast_to(sinr_ref[r].astype(jnp.float32), (Tp, C))
                     for r in range(L)], axis=0)

                def rope_rows_res(x):
                    x32 = x.astype(jnp.float32)
                    return (x32 * cr + rotate_half(x32) * sr).astype(x.dtype)

                q_all = rope_rows_res(qkv[:, :C])  # (R, C), i-major rows
                k_all = rope_rows_res(qkv[:, C:2 * C])
                ks = [k_all[r * Tp:(r + 1) * Tp] for r in range(L)]
            vs = [blk(qkv, r)[:, 2 * C:] for r in range(L)]
            ks.append(rope_res(jnp.broadcast_to(bkl, (Tp, C)).astype(dt), L))
            vs.append(jnp.broadcast_to(bvl, (Tp, C)).astype(dt))

            Sd = S.astype(dt)
            if s1_merged:
                # block j of the stacked sheets = key j row-tiled across the
                # stacked query rows (concats are copies at VMEM speed); the
                # (J*R, 1) stacked bias arrives precomputed from the host
                # (in-kernel lane-column concat is a Mosaic layout mismatch)
                k_stack = jnp.concatenate(
                    [jnp.concatenate([ks[j]] * L, axis=0) for j in range(J)], axis=0)
                q_tile = jnp.concatenate([q_all] * J, axis=0)  # (J*R, C)
                # "M" perf probe: elementwise pair-product cost
                e_all = q_tile if "M" in stages else q_tile * k_stack
                l_all = jax.lax.dot_general(
                    e_all, Sd, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (J*R, H)
                l_all = l_all + bias_l_ref[0]  # (J*R, 1) stacked bias
                # "X" perf probe: stage-1 exp cost (wrong values)
                p_all = l_all if "X" in stages else jnp.exp2(jnp.minimum(l_all, 100.0))
                denom = p_all[0:R]
                for j in range(1, J):
                    denom = denom + p_all[j * R:(j + 1) * R]
                inv = 1.0 / (denom + 1e-30)  # (R, H)
                p_scaled = p_all * jnp.concatenate([inv] * J, axis=0)
                pv = jax.lax.dot_general(
                    p_scaled, St, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (J*R, C)
                v_stack = jnp.concatenate(
                    [jnp.concatenate([vs[j]] * L, axis=0) for j in range(J)],
                    axis=0).astype(jnp.float32)
                # "K" perf probe: stage-1 PV product cost
                prod = pv if "K" in stages else pv * v_stack
                acc = prod[0:R]
                for j in range(1, J):
                    acc = acc + prod[j * R:(j + 1) * R]
                att1 = acc.astype(dt)  # (R, C)
            else:
                bias_l = bias_l_ref[0]  # (Tp, J)
                ls = []
                for j in range(J):
                    k_t = jnp.concatenate([ks[j]] * L, axis=0)  # row-tile, ~free
                    e = q_all if "M" in stages else q_all * k_t
                    l = jax.lax.dot_general(
                        e, Sd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
                    )  # (R, H)
                    bias_j = jnp.concatenate([bias_l[:, j:j + 1]] * L, axis=0)  # (R, 1)
                    ls.append(l + bias_j)
                if "X" in stages:
                    ps = ls
                else:
                    ps = [jnp.exp2(jnp.minimum(l, 100.0)) for l in ls]
                denom = ps[0]
                for p in ps[1:]:
                    denom = denom + p
                inv = 1.0 / (denom + 1e-30)
                if "o" in stages:
                    # "o" probe: PV-merged form — ONE (J*R, H)@(H, C) dot
                    # replacing the J per-j dots. MEASURED DEAD END (0.650
                    # vs 0.617 ms/layer): the (J*R, C) f32 output
                    # materialization + row slices cost more than the 4
                    # saved MXU-op latencies; the per-j (R, C) sheets feed
                    # their fma immediately instead.
                    p_stack = jnp.concatenate([ps[j] * inv for j in range(J)], axis=0)
                    pv = jax.lax.dot_general(
                        p_stack, St, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (J*R, C)
                    acc = jnp.zeros((R, C), jnp.float32)
                    for j in range(J):
                        v_t = jnp.concatenate([vs[j]] * L, axis=0).astype(jnp.float32)
                        acc = (pv[j * R:(j + 1) * R] if "K" in stages
                               else acc + pv[j * R:(j + 1) * R] * v_t)
                else:
                    acc = jnp.zeros((R, C), jnp.float32)
                    for j in range(J):
                        p_exp = jax.lax.dot_general(
                            ps[j] * inv, St, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
                        )  # (R, C)
                        v_t = jnp.concatenate([vs[j]] * L, axis=0).astype(jnp.float32)
                        # "K" perf probe: stage-1 PV fma-accumulate cost
                        acc = p_exp if "K" in stages else acc + p_exp * v_t
                att1 = acc.astype(dt)  # (R, C)
        else:
            att1 = qkv[:, 2 * C:]
        X1 = (X.astype(jnp.float32) + gatev(2) * matmul(att1, wout_l, bout_l)).astype(dt)
      else:
        X1 = X

      # ---- stage 2: frame attention over Tp, residues independent ----
      # Grouped-stack core per residue (ops/residue... see _grouped_attend);
      # RoPE runs once over all L*Tp stacked rows instead of per residue
      # (r3: merging the per-(r, g) softmax chains measured slower — the
      # grouped core's softmax surface is already the right granularity).
      if "2" in stages:
        qkv = matmul(modln(X1, 3), wqkv_t, bqkv_t).astype(dt)  # (R, 3Cp)
        if "a" not in stages:
            # bias-token block width = whatever the host padded the key axis
            # to (8 rows, or up to the next 128-lane multiple — "W" probe)
            BKT = bias_t_ref.shape[2] - Tp
            bk_blk = rope_t(jnp.broadcast_to(bkt, (BKT, Cp)).astype(dt), Tp, BKT)
            bv_blk = jnp.broadcast_to(bvt, (BKT, Cp)).astype(dt)
            if "R" in stages:  # perf probe: rope ablated
                q_all, k_all = qkv[:, :Cp], qkv[:, Cp:2 * Cp]
            else:
                cos_rows = jnp.concatenate([cost_ref[0:Tp]] * L, axis=0).astype(jnp.float32)
                sin_rows = jnp.concatenate([sint_ref[0:Tp]] * L, axis=0).astype(jnp.float32)

                def rope_rows(x):
                    x32 = x.astype(jnp.float32)
                    return (x32 * cos_rows + rotate_half_t(x32) * sin_rows).astype(x.dtype)

                q_all = rope_rows(qkv[:, :Cp])
                k_all = rope_rows(qkv[:, Cp:2 * Cp])
            # row-layout softmax core with the reduce trees batched across
            # every (residue, head-group) block (_grouped_attend_all). A
            # transposed-softmax variant (logits (TKt, gh*Tp) off the MXU so
            # max/sum reduce over sublanes) measured SLOWER — 0.306 vs 0.252
            # ms stage-2: the lane-stacked qT build + final transpose cost
            # more than the reduce trees removed. PERF.md r3 dead-ends.
            kbTs, vbs = [], []
            for r in range(L):
                kb_r = jnp.concatenate([k_all[r * Tp:(r + 1) * Tp], bk_blk], axis=0)
                kbTs.append(kb_r.T)  # (Cp, TKt)
                vbs.append(jnp.concatenate([blk(qkv, r)[:, 2 * Cp:], bv_blk], axis=0))
            # (a reduce-tree-BATCHED variant — all (r, group) blocks' logits
            # row-concatenated so one max/exp/sum chain serves the stage —
            # measured 0.283 vs 0.250 ms stage-2: the 3.4 MB/program logits
            # concat copy costs more than the merged trees save. The trees
            # are element-throughput-bound, not invocation-bound.)
            atts = []
            for r in range(L):
                att = _grouped_attend(
                    q_all[r * Tp:(r + 1) * Tp], kbTs[r], vbs[r],
                    bias_t_ref[0, r:r + 1, :], H, Dp, probes=stages,
                    base2=True)  # wqkv_t carries scale * LOG2E (fold contract)
                atts.append(att.astype(dt))
            att2 = jnp.concatenate(atts, axis=0)  # (R, Cp)
        else:
            att2 = qkv[:, 2 * Cp:]
        X2 = (X1.astype(jnp.float32) + gatev(5) * matmul(att2, wout_t, bout_t)).astype(dt)
      else:
        X2 = X1

      # ---- stage 3: MLP ----
      if "3" in stages:
        if "f" in stages:  # perf probe: bf16 GELU surface — fc1 emits bf16
            # (convert fused into the dot's store), the whole poly chain
            # runs on the half-traffic surface (values differ only by bf16
            # rounding of the hidden activation)
            a = jax.lax.dot_general(
                modln(X2, 6), w1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt) + b1
            a = _gelu_fast(a)
            y = matmul(a, w2, b2)
        else:
            a = matmul(modln(X2, 6), w1, b1)  # (R, 4C) f32
            # gelu stays f32 via the algebraic-sigmoid fit (_gelu_fast): the
            # A&S erf chain (exp + divide + sign/select) measured 0.079
            # ms/layer — the largest single non-matmul cost in the kernel. A
            # bf16 erf chain fails to lower (Mosaic rejects bf16 cmpf) and a
            # split-halves software pipeline measured neutral (PERF.md r3).
            if "g" in stages:  # perf probe: erf-GELU cost (wrong values)
                a = a * 0.25
            else:
                a = _gelu_fast(a)
            y = matmul(a.astype(dt), w2, b2)
        OUT = X2.astype(jnp.float32) + gatev(8) * y
      else:
        OUT = X2.astype(jnp.float32)

      # stage-input residuals for the fused Pallas backward (stacked layout,
      # ops/fused_layer_bwd.py): X1 feeds the frame-attention backward, X2
      # the MLP backward; stage 1 recomputes from the saved layer input,
      # which for layers past the first is saved here in trunk layout
      if res_refs:
        if NLt:
            x1_ref, x2_ref, xin_ref = res_refs
            x1_ref[0, 0] = X1
            x2_ref[0, 0] = X2.astype(x2_ref.dtype)

            if fold_final:
                # every layer output saved (the folded head's backward
                # consumes the last one)
                for r in range(L):
                    xin_ref[0, 0, :, r * C:(r + 1) * C] = blk(OUT, r).astype(xin_ref.dtype)
            else:
                @pl.when(li_s < NLt - 1)
                def _(OUT=OUT):
                    # xin block (b, min(i, NL-2)): at i = NL-1 the revisited
                    # block simply persists — no store, no contamination
                    for r in range(L):
                        xin_ref[0, 0, :, r * C:(r + 1) * C] = blk(OUT, r).astype(xin_ref.dtype)
        elif NL == 1:
            x1_ref, x2_ref = res_refs
            x1_ref[0] = X1
            x2_ref[0] = X2.astype(x2_ref.dtype)
        else:
            x1_ref, x2_ref, xin_ref = res_refs
            x1_ref[0, li] = X1
            x2_ref[0, li] = X2.astype(x2_ref.dtype)
            if li < NL - 1:
                for r in range(L):
                    xin_ref[0, li, :, r * C:(r + 1) * C] = blk(OUT, r).astype(xin_ref.dtype)

      # next layer consumes this layer's output (stacked rows stay in VMEM)
      X = OUT.astype(dt)

    if NLt:
        @pl.when(lq < NLt - 1)
        def _(X=X):
            xbuf[...] = X

        @pl.when(lq == NLt - 1)
        def _(X=X):
            if fold_final:
                # folded output head (bit-identical to models.layers.
                # FinalLayer): f32 LN -> bf16 modulate -> zero-init linear,
                # emitted as the f32 latent in OP-lane blocks per residue
                x32 = X.astype(jnp.float32)
                mean = jnp.mean(x32, axis=1, keepdims=True)
                var = jnp.mean(x32 * x32, axis=1, keepdims=True) - mean * mean
                hn = ((x32 - mean) * jax.lax.rsqrt(var + _LN_EPS)).astype(dt)
                shf = modf_ref[0, 0, 0:1, :].astype(dt)
                scf = modf_ref[0, 0, 1:2, :].astype(dt)
                hn = hn * (1 + scf) + shf
                y = jax.lax.dot_general(
                    hn, wfin_ref[...].astype(dt), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dt) + bfin_ref[...].astype(dt)
                OPL = wfin_ref.shape[1]
                if step_dt is None:
                    for r in range(L):
                        o_ref[0, :, r * OPL:(r + 1) * OPL] = blk(y, r).astype(o_ref.dtype)
                elif S_steps == 1:
                    for r in range(L):
                        # folded euler update: out = carry + dt * velocity
                        # (identical to the sampler's xc + dt * v — v is the
                        # f32-cast bf16 head output either way)
                        o_ref[0, :, r * OPL:(r + 1) * OPL] = (
                            x_ref[0][:, r * OPL:(r + 1) * OPL]
                            + step_dt * blk(y, r).astype(jnp.float32))
                else:
                    # multi-step fold: the euler update lands in the in-VMEM
                    # inter-step carry (cbuf) until the last step, which
                    # emits to HBM — the carry of an S-step group never
                    # leaves the chip
                    @pl.when(li_s == NLt - 1)  # step 0: base = HBM input
                    def _(y=y):
                        for r in range(L):
                            cbuf[:, r * OPL:(r + 1) * OPL] = (
                                x_ref[0][:, r * OPL:(r + 1) * OPL]
                                + step_dt * blk(y, r).astype(jnp.float32))

                    if S_steps > 2:
                        @pl.when(jnp.logical_and(li_s > NLt - 1,
                                                 li_s < S_steps * NLt - 1))
                        def _(y=y):
                            for r in range(L):
                                cbuf[:, r * OPL:(r + 1) * OPL] = (
                                    cbuf[:, r * OPL:(r + 1) * OPL]
                                    + step_dt * blk(y, r).astype(jnp.float32))

                    @pl.when(li_s == S_steps * NLt - 1)  # last step -> HBM
                    def _(y=y):
                        for r in range(L):
                            o_ref[0, :, r * OPL:(r + 1) * OPL] = (
                                cbuf[:, r * OPL:(r + 1) * OPL]
                                + step_dt * blk(y, r).astype(jnp.float32))
            else:
                for r in range(L):
                    o_ref[0, :, r * C:(r + 1) * C] = blk(X, r).astype(o_ref.dtype)
    else:
        # unstack rows -> lanes
        for r in range(L):
            o_ref[0, :, r * C:(r + 1) * C] = blk(X, r).astype(o_ref.dtype)


def _s1_layout(T: int, L: int, C: int, stages: str = "123"):
    """(Tp, TKt, s1_merged) — the kernel's padded frame rows, stage-2 key-axis
    width, and whether stage 1 runs the merged-stacked form ("9" probe)."""
    Tp = -(-T // 8) * 8
    tk128 = -(-(Tp + 8) // 128) * 128
    TKt = tk128 if tk128 - (Tp + 8) <= 24 else Tp + 8
    J = L + 1
    s1_merged = "9" in stages and J * L * Tp * C * 4 <= 8 * 1024 * 1024
    return Tp, TKt, s1_merged


def make_trunk_biases(mask, T: int, L: int, C: int, stages: str = "123"):
    """The kernel's additive mask biases (bias_l, bias_t) — pure functions of
    the (loop-invariant) mask. Samplers precompute them once per sample call
    (denoiser.make_scan_consts) so the ODE-step scan does not rebuild them
    every step; _trunk_call computes them itself when not supplied."""
    B = mask.shape[0]
    Tp, TKt, s1_merged = _s1_layout(T, L, C, stages)
    J = L + 1
    # residue-attention additive bias (B, Tp, J): mask (B, T, L) keys + the
    # always-attendable bias token
    bias_l = (mask.astype(jnp.float32) - 1.0) * -_NEG_INF  # (B, T, L)
    bias_l = jnp.concatenate([bias_l, jnp.zeros((B, T, 1), jnp.float32)], axis=2)
    if Tp != T:
        bias_l = jnp.pad(bias_l, ((0, 0), (0, Tp - T), (0, 0)))
    if s1_merged:
        # merged stage-1 ("9" probe, see _kernel): stacked row order
        # (j-major, then residue, then frame)
        R_rows = L * Tp
        bias_l = jnp.broadcast_to(
            bias_l.transpose(0, 2, 1)[:, :, None, :], (B, J, L, Tp)
        ).reshape(B, J * R_rows, 1)
    # frame-attention additive bias (B, L, TKt)
    kv_t = mask.transpose(0, 2, 1)  # (B, L, T)
    bias_t = (kv_t.astype(jnp.float32) - 1.0) * -_NEG_INF
    tail = jnp.full((B, L, TKt - T), _NEG_INF, jnp.float32)
    tail = tail.at[:, :, Tp - T].set(0.0)
    bias_t = jnp.concatenate([bias_t, tail], axis=2)
    return bias_l, bias_t


def _trunk_call(x, mods, ws, mask, num_heads: int, T: int, L: int,
                interpret: bool = False, stages: str = "123",
                save_residuals: bool = False, final=None, embed=None,
                step_dt=None, biases=None, ode_steps: int = 1):
    """One pallas_call over ``NL`` layers. ``x`` (B, Tp, L*C) frame-padded;
    ``mods`` (B, NL, 9C); ``ws`` = 16-tuple of NL-stacked weights in their
    original (unpadded-head) shapes. Returns the padded-trunk output, plus
    (x1s, x2s[, x_ins]) residuals when ``save_residuals``. ``final``
    (streaming mode only) = (modf (B, 2C), wfin (C, out), bfin (out,)):
    the FinalLayer head runs inside the last program — its f32 LN/modulate/
    projection never materialize on the full trunk in HBM — and the first
    output becomes the latent, (B, Tp, L*OP) f32, OP = out rounded to 128
    lanes."""
    B = x.shape[0]
    if embed is not None:
        LC = embed[1].shape[2]
        cdt = embed[1].dtype  # compute dtype (x is the f32 carry here)
    else:
        LC = x.shape[2]
        cdt = x.dtype
    C = LC // L
    NL = ws[0].shape[0]
    SS = ode_steps
    assert mods.size == x.shape[0] * SS * NL * 9 * C
    (wqkv_l, bqkv_l, wout_l, bout_l, wqkv_t, bqkv_t, wout_t, bout_t,
     w1, b1, w2, b2, bkl, bvl, bkt, bvt) = ws
    D = C // num_heads
    F = w1.shape[-1]
    J = L + 1
    # TKt: widen the bias-token block to a 128-lane-multiple key axis when
    # the padding is small (<= 24 masked rows) — the stage-2 logits/p/PV
    # surfaces then tile exactly (0.681 -> 0.677 ms; at larger Tp the extra
    # masked-key flops outweigh the alignment). s1_merged ("9" probe): the J
    # per-key logit/PV dots collapse into two stacked matmuls — MEASURED
    # DEAD END at the bench shape (0.647 vs 0.617 ms/layer: the q/k/v
    # row-tile copies cost more than the ~8 saved MXU-op latencies); kept as
    # a probe for other shapes.
    Tp, TKt, s1_merged = _s1_layout(T, L, C, stages)
    BKT = TKt - Tp
    R_rows = L * Tp
    if biases is not None:
        bias_l, bias_t = biases
    else:
        bias_l, bias_t = make_trunk_biases(mask, T, L, C, stages)

    cosr_np, sinr_np, fh_np, s_np = _res_tables_np(J, D, C)
    cost_np, sint_np, _ = _time_tables_np(T + 1, D, C)

    # stage-2 lane-padded head layout (see _kernel): Dp = 32 when D = 24
    H = num_heads
    Dp = D if "c" in stages else (32 if 128 % D else D)
    Cp = H * Dp

    def dpad(a, part_shape, axis):
        """pad the per-head D lanes of ``a`` to Dp and flatten back
        (``a`` carries a leading NL dim)."""
        if Dp == D:
            return a
        a = a.reshape((NL,) + part_shape)
        pads = [(0, 0)] * a.ndim
        pads[axis + 1] = (0, Dp - D)
        return jnp.pad(a, pads)

    if wqkv_t.shape[-1] == 3 * Cp and Dp != D:
        # pre-padded by pad_stage2_ws in the hoisted pack
        wqkv_t_p = wqkv_t
        bqkv_t_p = bqkv_t.reshape(NL, 1, 3 * Cp)
        wout_t_p = wout_t
        bkt_p = bkt.reshape(NL, 1, Cp)
        bvt_p = bvt.reshape(NL, 1, Cp)
    else:
        wqkv_t_p = dpad(wqkv_t, (C, 3, H, D), 3).reshape(NL, C, 3 * Cp)
        bqkv_t_p = dpad(bqkv_t.reshape(NL, -1), (3, H, D), 2).reshape(NL, 1, 3 * Cp)
        wout_t_p = dpad(wout_t, (H, D, C), 1).reshape(NL, Cp, C)
        bkt_p = dpad(bkt.reshape(NL, -1), (H, D), 1).reshape(NL, 1, Cp)
        bvt_p = dpad(bvt.reshape(NL, -1), (H, D), 1).reshape(NL, 1, Cp)

    def tpad_np(base):
        """(n, C) rope table -> (n, Cp) with cos = sin = 0 on pad lanes."""
        if Dp == D:
            return base
        n = base.shape[0]
        return np.pad(base.reshape(n, H, D), ((0, 0), (0, 0), (0, Dp - D))).reshape(n, Cp)

    def ttable(base):
        ext_q = base[list(range(T)) + [T - 1] * (Tp - T)] if Tp != T else base[:T]
        return np.concatenate([ext_q, np.tile(base[T:T + 1], (BKT, 1))], axis=0)

    cosr = jnp.asarray(cosr_np, jnp.float32).reshape(J, 1, C)
    sinr = jnp.asarray(sinr_np, jnp.float32).reshape(J, 1, C)
    cost = jnp.asarray(ttable(tpad_np(cost_np)), jnp.float32)
    sint = jnp.asarray(ttable(tpad_np(sint_np)), jnp.float32)
    fh = jnp.asarray(fh_np, jnp.float32).reshape(1, C)
    fht_np = ((np.arange(Cp) % Dp) < D // 2).astype(np.float32)
    fht = jnp.asarray(fht_np, jnp.float32).reshape(1, Cp)
    S = jnp.asarray(s_np, jnp.float32)

    Tp_rows = L * Tp
    stream = NL > 1

    def rep(shape):
        n = len(shape)
        return pl.BlockSpec(shape, lambda *g, _n=n: (0,) * _n)

    def bat(shape):
        n = len(shape) - 1
        return pl.BlockSpec(shape, lambda b, *g, _n=n: (b,) + (0,) * _n)

    if stream:
        # streaming trunk: grid (B, S*NL) — program (b, i) runs euler step
        # i // NL, layer i % NL, pulling that layer's weights through its
        # BlockSpec (double-buffered against compute) while the activation
        # persists in VMEM scratch across i
        def wspec(shape):
            n = len(shape)
            return pl.BlockSpec((1,) + shape,
                                lambda b, i, _n=n: (i % NL,) + (0,) * _n)

        mod_spec = pl.BlockSpec((1, 1, 9, C), lambda b, i: (b, i, 0, 0))
        grid = (B, SS * NL)
        kernel_kw = dict(num_layers=1, stream_layers=NL, ode_steps=SS)
        scratch = [pltpu.VMEM((Tp_rows, C), cdt)]
    else:
        assert SS == 1
        def wspec(shape):
            return rep((NL,) + shape)

        mod_spec = pl.BlockSpec((1, NL, 9, C), lambda b: (b, 0, 0, 0))
        grid = (B,)
        kernel_kw = dict(num_layers=NL)
        scratch = []

    # folded output head: extra inputs + latent-shaped first output
    assert final is None or stream, "final folding needs the streaming trunk"
    assert embed is None or (stream and not save_residuals), \
        "embed folding is the inference scan fast path (streaming trunk only)"
    assert step_dt is None or (embed is not None and final is not None)
    assert SS == 1 or step_dt is not None, \
        "multi-step fold is the euler fast path (needs embed + final + dt)"
    emb_inputs, emb_specs = (), ()
    x_spec = bat((1, Tp, L * C))
    if embed is not None:
        wlat_p, cadd, enc = embed
        P = wlat_p.shape[0]
        x_spec = bat((1, Tp, L * P))
        emb_inputs = (wlat_p, cadd)
        emb_specs = (rep((P, C)), bat((1, Tp, L * C)))
        if enc is not None:
            # per-STEP encoder rows: (B, S, 1, L*C) — program (b, i) reads
            # step i // NL's row (4D so the block's last two dims satisfy
            # the TPU 8/128-or-full rule)
            emb_inputs += (enc.reshape(B, SS, 1, L * C),)
            emb_specs += (pl.BlockSpec((1, 1, 1, L * C),
                                       lambda b, i: (b, i // NL, 0, 0)),)
    fin_inputs, fin_specs = (), ()
    if final is not None:
        modf, wfin, bfin = final
        OUTC = wfin.shape[1]
        OP = -(-OUTC // 128) * 128
        assert SS == 1 or embed[0].shape[0] == OP, \
            "inter-step carry: the head's lane width must equal the embed's"
        wfin_p = jnp.pad(wfin, ((0, 0), (0, OP - OUTC)))
        bfin_p = jnp.pad(bfin.reshape(1, -1), ((0, 0), (0, OP - OUTC)))
        fin_inputs = (modf.reshape(B, SS, 2, C), wfin_p, bfin_p)
        fin_specs = (pl.BlockSpec((1, 1, 2, C), lambda b, i: (b, i // NL, 0, 0)),
                     rep((C, OP)), rep((1, OP)))
        out_specs = bat((1, Tp, L * OP))
        out_shape = jax.ShapeDtypeStruct((B, Tp, L * OP), jnp.float32)
        if SS > 1:
            scratch = scratch + [pltpu.VMEM((Tp, L * OP), jnp.float32)]
    else:
        out_specs = bat((1, Tp, L * C))
        out_shape = jax.ShapeDtypeStruct((B, Tp, L * C), cdt)
    if save_residuals:
        if NL == 1:
            res_spec = pl.BlockSpec((1, Tp_rows, C), lambda b: (b, 0, 0))
            res_shape = jax.ShapeDtypeStruct((B, Tp_rows, C), cdt)
            out_specs = [out_specs, res_spec, res_spec]
            out_shape = [out_shape, res_shape, res_shape]
        else:
            res_spec = pl.BlockSpec((1, 1, Tp_rows, C), lambda b, i: (b, i, 0, 0))
            res_shape = jax.ShapeDtypeStruct((B, NL, Tp_rows, C), cdt)
            if final is not None:
                # the folded head's backward needs the final trunk output
                # too: all NL layer outputs are saved
                xin_spec = pl.BlockSpec((1, 1, Tp, L * C),
                                        lambda b, i: (b, i, 0, 0))
                xin_shape = jax.ShapeDtypeStruct((B, NL, Tp, L * C), cdt)
            else:
                # block (b, min(i, NL-2)): the final program revisits the
                # last block and stores nothing, so it flushes unchanged
                xin_spec = pl.BlockSpec(
                    (1, 1, Tp, L * C),
                    lambda b, i: (b, jnp.minimum(i, NL - 2), 0, 0))
                xin_shape = jax.ShapeDtypeStruct((B, NL - 1, Tp, L * C), cdt)
            out_specs = [out_specs, res_spec, res_spec, xin_spec]
            out_shape = [out_shape, res_shape, res_shape, xin_shape]

    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, head_dim=D, channels=C,
                          stages=stages, fold_final=final is not None,
                          fold_embed=embed is not None,
                          has_enc=embed is not None and embed[2] is not None,
                          step_dt=step_dt, s1_merged=s1_merged,
                          **kernel_kw),
        grid=grid,
        in_specs=[
            x_spec,
            mod_spec,
            *fin_specs,
            *emb_specs,
            wspec((C, 3 * C)),
            wspec((1, 3 * C)),
            wspec((C, C)),
            wspec((1, C)),
            wspec((C, 3 * Cp)),
            wspec((1, 3 * Cp)),
            wspec((Cp, C)),
            wspec((1, C)),
            wspec((C, F)),
            wspec((1, F)),
            wspec((F, C)),
            wspec((1, C)),
            wspec((1, C)),
            wspec((1, C)),
            wspec((1, Cp)),
            wspec((1, Cp)),
            bat((1, J * R_rows, 1)) if s1_merged else bat((1, Tp, J)),
            bat((1, L, TKt)),
            rep((J, 1, C)),
            rep((J, 1, C)),
            rep((TKt, Cp)),
            rep((TKt, Cp)),
            rep((1, C)),
            rep((1, Cp)),
            rep((C, num_heads)),
            rep((num_heads, C)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        # streamed weights + residual write buffers exceed the compiler's
        # default 16M scoped cap; lift it (128M physical). 96M: the f32
        # RTB-sampler trunk at T=250 measured 232K over the effective cap
        # the 64M setting yielded (r4).
        **({"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024)} if NL > 1 else {}),
    )(x, mods.reshape(B, SS * NL, 9, C) if stream else mods.reshape(B, NL, 9, C),
      *fin_inputs, *emb_inputs,
      wqkv_l, bqkv_l.reshape(NL, 1, 3 * C), wout_l, bout_l.reshape(NL, 1, C),
      wqkv_t_p, bqkv_t_p, wout_t_p, bout_t.reshape(NL, 1, C),
      w1, b1.reshape(NL, 1, F), w2, b2.reshape(NL, 1, C),
      bkl.reshape(NL, 1, C).astype(cdt), bvl.reshape(NL, 1, C).astype(cdt),
      bkt_p.astype(cdt), bvt_p.astype(cdt),
      bias_l, bias_t, cosr, sinr, cost, sint, fh, fht, S, S.T)
    return out


@functools.partial(jax.jit, static_argnames=("num_heads", "T", "L", "interpret", "stages",
                                             "padded_io", "save_residuals"))
def _pallas_fwd(x, mod, wqkv_l, bqkv_l, wout_l, bout_l, wqkv_t, bqkv_t, wout_t, bout_t,
                w1, b1, w2, b2, bkl, bvl, bkt, bvt, mask,
                num_heads: int, T: int, L: int, interpret: bool = False,
                stages: str = "123", padded_io: bool = False,
                save_residuals: bool = False):
    """Single-layer whole-layer kernel (NL = 1 view of _trunk_call).
    ``padded_io``: x arrives (B, Tp, L*C) already frame-padded and the
    result is returned in the same layout — the caller keeps the WHOLE trunk
    padded so the per-layer pad/slice (which blocks XLA from cancelling the
    (B, T*L, C) <-> (B, T, L*C) boundary relayouts) happens once per
    forward, not once per layer."""
    if padded_io:
        B, _, LC = x.shape
        C = LC // L
    else:
        B, N, C = x.shape
    Tp = -(-T // 8) * 8

    if not padded_io:
        x = x.reshape(B, T, L * C)
        if Tp != T:
            x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))

    ws = tuple(w[None] for w in (wqkv_l, bqkv_l, wout_l, bout_l, wqkv_t, bqkv_t,
                                 wout_t, bout_t, w1, b1, w2, b2, bkl, bvl, bkt, bvt))
    out = _trunk_call(x, mod.reshape(B, 1, 9 * C), ws, mask, num_heads, T, L,
                      interpret=interpret, stages=stages,
                      save_residuals=save_residuals)
    if save_residuals:
        out, x1s, x2s = out
        if not padded_io:
            out = out[:, :T].reshape(B, T * L, C)
        return out, x1s, x2s
    if padded_io:
        return out
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
    out = _res_xla(q, k, v, bkl, bvl, mask, num_heads, base2=True)
    y = out.reshape(B, N, C) @ wout_l.astype(x.dtype) + bout_l.astype(x.dtype)
    x = x + g_l[:, None] * y

    x = _block_xla(x, sh_t, sc_t, g_t, wqkv_t, bqkv_t, wout_t, bout_t, bkt, bvt,
                   mask.transpose(0, 2, 1), num_heads, T, L)

    return _mlp_xla(x, sh_m, sc_m, g_m, w1, b1, w2, b2)


def _layer_kernels(x, mod, wqkv_l, bqkv_l, wout_l, bout_l, wqkv_t, bqkv_t, wout_t,
                   bout_t, w1, b1, w2, b2, bkl, bvl, bkt, bvt, mask, num_heads, T, L,
                   t_logical=None):
    """Modular composition routing each stage through its kernel dispatcher —
    the TPU path for shapes the whole-layer kernel cannot hold in VMEM
    (T > MAX_T flagship forward-sim T=1000, large-L ATLAS crop-256). Same
    math as _layer_xla; each stage engages its fused-block / blocked-core
    Pallas kernel where its own gates allow. ``t_logical``: real frame count
    when x/mask arrive frame-padded to T (padded-trunk routing — frames past
    t_logical are zero-masked; the residue/MLP stages are frame-independent,
    the time stage ropes its bias token at position t_logical)."""
    from .adaln_mlp import adaln_mlp
    from .residue_attention import MAX_L as RES_MAX_L
    from .time_attention import time_attention_block

    B, N, C = x.shape
    modr = mod.reshape(B, 9, C)
    sh_l, sc_l, g_l = modr[:, 0], modr[:, 1], modr[:, 2]
    sh_t, sc_t, g_t = modr[:, 3], modr[:, 4], modr[:, 5]
    sh_m, sc_m, g_m = modr[:, 6], modr[:, 7], modr[:, 8]

    if L > RES_MAX_L:
        # large L (ATLAS crop-256): each frame's L residue rows are
        # CONTIGUOUS in the trunk layout, so the blocked whole-block kernel
        # grids over (B, T) with a rank-4 BlockSpec — the whole stage (LN +
        # modulate + qkv + attend over residues + out-proj + gate + residual)
        # with ZERO physical activation transposes (replaced the swap-axes
        # routing's two (B,T,L,C)<->(B,L,T,C) transposes per layer, r3s3).
        from .time_attention import residue_rows_block
        x = residue_rows_block(x, sh_l, sc_l, g_l, wqkv_l, bqkv_l, wout_l,
                               bout_l, bkl, bvl, mask,
                               num_heads=num_heads, tl=(T, L))
    else:
        # small L at long T: the whole stage (LN + modulate + qkv + rope +
        # pair-loop attention + out-proj + gate + residual) fuses into ONE
        # frame-blocked kernel — the XLA pieces around the bare attention
        # core cost ~2x the core at T=1000 (r3 device profile)
        from .residue_block import residue_block
        x = residue_block(x, sh_l, sc_l, g_l, wqkv_l, bqkv_l, wout_l, bout_l,
                          bkl, bvl, mask, num_heads=num_heads, tl=(T, L))

    x = time_attention_block(x, sh_t, sc_t, g_t, wqkv_t, bqkv_t, wout_t, bout_t,
                             bkt, bvt, mask.transpose(0, 2, 1),
                             num_heads=num_heads, tl=(T, L),
                             t_logical=t_logical)

    return adaln_mlp(x, sh_m, sc_m, g_m, w1, b1, w2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(19, 20, 21, 22, 23))
def _fused_layer_pallas(x, mod, wqkv_l, bqkv_l, wout_l, bout_l, wqkv_t, bqkv_t,
                        wout_t, bout_t, w1, b1, w2, b2, bkl, bvl, bkt, bvt, mask,
                        num_heads, T, L, interpret=False, padded_io=False):
    return _pallas_fwd(x, mod, wqkv_l, bqkv_l, wout_l, bout_l, wqkv_t, bqkv_t,
                       wout_t, bout_t, w1, b1, w2, b2, bkl, bvl, bkt, bvt, mask,
                       num_heads, T, L, interpret=interpret, padded_io=padded_io)


def _fl_fwd(x, mod, wqkv_l, bqkv_l, wout_l, bout_l, wqkv_t, bqkv_t, wout_t, bout_t,
            w1, b1, w2, b2, bkl, bvl, bkt, bvt, mask, num_heads, T, L, interpret,
            padded_io):
    args = (x, mod, wqkv_l, bqkv_l, wout_l, bout_l, wqkv_t, bqkv_t, wout_t, bout_t,
            w1, b1, w2, b2, bkl, bvl, bkt, bvt, mask)
    out, x1s, x2s = _pallas_fwd(*args, num_heads, T, L, interpret=interpret,
                                padded_io=padded_io, save_residuals=True)
    return out, (args, x1s, x2s)


def _unpad_trunk(x, T, L, C):
    B = x.shape[0]
    return x[:, :T].reshape(B, T * L, C)


def _pad_trunk(x_flat, T, L, C):
    B = x_flat.shape[0]
    Tp = -(-T // 8) * 8
    x = x_flat.reshape(B, T, L * C)
    return jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0))) if Tp != T else x


def _fl_bwd(num_heads, T, L, interpret, padded_io, res, grad):
    import os

    from .fused_layer_bwd import fused_layer_bwd

    args, x1s, x2s = res
    if os.environ.get("MDGEN_FUSED_BWD", "") != "xla":
        # fused Pallas backward (ops/fused_layer_bwd.py): three stage
        # kernels rematerialize the forward from (x, X1, X2) and accumulate
        # f32 weight grads across the batch grid
        x = args[0]
        C = x.shape[2] // L if padded_io else x.shape[2]
        xp = x if padded_io else _pad_trunk(x, T, L, C)
        gp = grad if padded_io else _pad_trunk(grad, T, L, C)
        grads = fused_layer_bwd(xp, *args[1:], x1s, x2s, gp,
                                num_heads=num_heads, T=T, L=L,
                                interpret=interpret)
        dx = grads[0] if padded_io else _unpad_trunk(grads[0], T, L, C)
        return (dx,) + grads[1:] + (None,)

    # XLA-composition fallback (MDGEN_FUSED_BWD=xla A/B escape hatch)
    if padded_io:
        x_p, rest = args[0], args[1:]
        C = x_p.shape[2] // L

        def f(x_flat, *a):
            out = _layer_xla(x_flat, *a, num_heads, T, L)
            return _pad_trunk(out, T, L, C)

        _, vjp = jax.vjp(f, _unpad_trunk(x_p, T, L, C), *rest)
        grads = vjp(grad)
        return (_pad_trunk(grads[0], T, L, C),) + grads[1:18] + (None,)
    _, vjp = jax.vjp(lambda *a: _layer_xla(*a, num_heads, T, L), *args)
    grads = vjp(grad)
    return grads[:18] + (None,)


_fused_layer_pallas.defvjp(_fl_fwd, _fl_bwd)


def fused_layer(x, mod, wqkv_l, bqkv_l, wout_l, bout_l, wqkv_t, bqkv_t, wout_t,
                bout_t, w1, b1, w2, b2, bkl, bvl, bkt, bvt, mask, *,
                num_heads: int, tl: tuple, force_xla: bool = False,
                force_pallas: bool = False, padded_io: bool = False):
    """The whole LatentMDGenLayer as one op. x (B, T*L, C) raw — or
    (B, Tp, L*C) frame-padded when ``padded_io`` (the padded-trunk fast path:
    the caller pads once per forward instead of once per layer); mod (B, 9C)
    AdaLN output (pre-split); wqkv_* (C, 3C) with the query scale folded into
    the q columns; mask (B, T, L) with 1 = valid."""
    import os

    from ..parallel.kernel_sharding import get_kernel_mesh, shard_map_batch0

    T, L = tl
    B = x.shape[0]
    C = x.shape[2] // L if padded_io else x.shape[2]
    env = os.environ.get("MDGEN_FUSED_LAYER", "")
    force_xla = force_xla or env == "xla"
    force_pallas = force_pallas or env == "pallas"
    use_pallas = force_pallas or (
        not force_xla and jax.default_backend() == "tpu" and C % 128 == 0
        and L <= MAX_L and T <= MAX_T
    )
    args = (x, mod, wqkv_l, bqkv_l, wout_l, bout_l, wqkv_t, bqkv_t, wout_t, bout_t,
            w1, b1, w2, b2, bkl, bvl, bkt, bvt, mask)

    def xla_path(*a):
        # fallback paths run on the flat trunk; un/re-pad at the boundary
        if padded_io:
            flat = _layer_xla(_unpad_trunk(a[0], T, L, C), *a[1:], num_heads, T, L)
            return _pad_trunk(flat, T, L, C)
        return _layer_xla(*a, num_heads, T, L)

    if use_pallas:
        interp = jax.default_backend() != "tpu"

        def local(*a):
            return _fused_layer_pallas(*a, num_heads, T, L, interp, padded_io)

        # x/mod/mask batched over dim 0; all weights + bias-KV replicated
        batched = (True, True) + (False,) * 16 + (True,)
        if jax.device_count() > 1 or get_kernel_mesh() is not None:
            out = shard_map_batch0(local, batched, *args)
            if out is not None:
                return out
            if not force_pallas:
                return xla_path(*args)
        return local(*args)
    if jax.default_backend() == "tpu" and not force_xla:
        # whole-layer kernel ineligible (long T / large L): modular
        # composition with per-stage kernels. The padded trunk stays padded
        # END-TO-END (r3s3): stages run with T := Tp on the free-reshaped
        # flat view and the time stage ropes its bias token at the real T
        # (t_logical) — the per-layer unpad/pad + in-call frame pad/slice
        # (~0.44 ms/layer at ATLAS, device profile) never materialize.
        if padded_io:
            Tp = x.shape[1]
            xf = x.reshape(B, Tp * L, C)
            maskp = mask if Tp == T else jnp.pad(
                mask, ((0, 0), (0, Tp - T), (0, 0)))
            out = _layer_kernels(xf, *args[1:-1], maskp, num_heads, Tp, L,
                                 t_logical=T)
            return out.reshape(B, Tp, L * C)
        return _layer_kernels(*args, num_heads, T, L)
    return xla_path(*args)


# ---------------------------------------------------------------------------
# whole-trunk mega-kernel: every layer in ONE pallas_call
# ---------------------------------------------------------------------------

# indices of the stage-2 (frame attention) entries in the 16-tuple
_S2_IDX = (4, 5, 6, 14, 15)  # wqkv_t, bqkv_t, wout_t, bkt, bvt


def _stage2_dims(C: int, num_heads: int):
    D = C // num_heads
    Dp = 32 if 128 % D else D
    return D, Dp, num_heads * Dp


def pad_stage2_ws(ws, num_heads: int):
    """Pre-apply the stage-2 lane-padded head layout (Dp = 32 when D = 24)
    to the NL-stacked trunk weights — in the hoisted pack this runs once per
    sample call instead of once per ODE step (~22 us/step of pad copies)."""
    C = ws[0].shape[1]
    D, Dp, Cp = _stage2_dims(C, num_heads)
    if Dp == D:
        return ws
    NL = ws[0].shape[0]
    H = num_heads

    def dpad(a, part, axis):
        a = a.reshape((NL,) + part)
        pads = [(0, 0)] * a.ndim
        pads[axis + 1] = (0, Dp - D)
        return jnp.pad(a, pads)

    w = list(ws)
    w[4] = dpad(ws[4], (C, 3, H, D), 3).reshape(NL, C, 3 * Cp)
    w[5] = dpad(ws[5].reshape(NL, -1), (3, H, D), 2).reshape(NL, 3 * Cp)
    w[6] = dpad(ws[6], (H, D, C), 1).reshape(NL, Cp, C)
    w[14] = dpad(ws[14].reshape(NL, -1), (H, D), 1).reshape(NL, Cp)
    w[15] = dpad(ws[15].reshape(NL, -1), (H, D), 1).reshape(NL, Cp)
    return tuple(w)


def unpad_stage2_ws(ws, num_heads: int):
    """Exact inverse of pad_stage2_ws (the pad lanes are zeros)."""
    C = ws[0].shape[1]
    D, Dp, Cp = _stage2_dims(C, num_heads)
    if Dp == D or ws[4].shape[-1] == 3 * C:
        return ws
    NL = ws[0].shape[0]
    H = num_heads

    def dslice(a, part, axis):
        a = a.reshape((NL,) + part)
        idx = [slice(None)] * a.ndim
        idx[axis + 1] = slice(0, D)
        return a[tuple(idx)]

    w = list(ws)
    w[4] = dslice(ws[4], (C, 3, H, Dp), 3).reshape(NL, C, 3 * C)
    w[5] = dslice(ws[5].reshape(NL, -1), (3, H, Dp), 2).reshape(NL, 3 * C)
    w[6] = dslice(ws[6], (H, Dp, C), 1).reshape(NL, C, C)
    w[14] = dslice(ws[14].reshape(NL, -1), (H, Dp), 1).reshape(NL, C)
    w[15] = dslice(ws[15].reshape(NL, -1), (H, Dp), 1).reshape(NL, C)
    return tuple(w)

# all layers' weights must fit VMEM alongside the activations; beyond this
# the per-layer whole-layer kernel (which streams one layer's weights at a
# time) is the right shape
_TRUNK_WEIGHT_BYTES = 48 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused_trunk_pallas(x, mods, ws, fin, mask, num_heads, T, L, interpret=False):
    return _trunk_call(x, mods, ws, mask, num_heads, T, L, interpret=interpret,
                       final=fin)


def _ft_fwd(x, mods, ws, fin, mask, num_heads, T, L, interpret):
    out, x1s, x2s, x_ins = _trunk_call(x, mods, ws, mask, num_heads, T, L,
                                       interpret=interpret, save_residuals=True,
                                       final=fin)
    return out, (x, mods, ws, fin, mask, x1s, x2s, x_ins)


def _ft_bwd(num_heads, T, L, interpret, res, grad):
    """Reverse per-layer sweep through the fused Pallas stage backwards
    (ops/fused_layer_bwd.py) using the mega-kernel's saved inter-layer
    activations — no forward recompute. With a folded output head, its
    (cheap) backward runs as the XLA VJP from the saved final trunk
    activation first."""
    from .fused_layer_bwd import fused_layer_bwd

    x, mods, ws, fin, mask, x1s, x2s, x_ins = res
    B = x.shape[0]
    NL = x1s.shape[1]
    C = x.shape[2] // L
    mods_r = mods.reshape(B, NL, 9 * C)
    # the per-layer stage backwards take the unpadded-head weights; grads
    # are re-padded below to match the primal's (possibly pre-padded) shape
    padded_in = ws[4].shape[-1] != 3 * C
    ws_u = unpad_stage2_ws(ws, num_heads)

    if fin is not None:
        # x_ins carries NL slots here; the last is the final trunk output
        h_last = x_ins[:, NL - 1]
        _, fvjp = jax.vjp(
            lambda h, m, w, b: _trunk_final_xla(h, m, w, b, T, L, C),
            h_last, *fin)
        g, dmodf, dwfin, dbfin = fvjp(grad)
        dfin = (dmodf.astype(fin[0].dtype), dwfin.astype(fin[1].dtype),
                dbfin.astype(fin[2].dtype))
    else:
        g = grad
        dfin = None

    dmods = [None] * NL
    dws = [[None] * NL for _ in range(16)]
    for i in reversed(range(NL)):
        x_in = x if i == 0 else x_ins[:, i - 1]
        w_i = tuple(w[i] for w in ws_u)
        grads = fused_layer_bwd(x_in, mods_r[:, i], *w_i, mask,
                                x1s[:, i], x2s[:, i], g,
                                num_heads=num_heads, T=T, L=L,
                                interpret=interpret)
        g = grads[0]
        dmods[i] = grads[1]
        for k in range(16):
            dws[k][i] = grads[2 + k]
    dmods_st = jnp.stack(dmods, axis=1).reshape(mods.shape).astype(mods.dtype)
    dws_st = tuple(jnp.stack(dws[k]).reshape(jnp.shape(ws_u[k])).astype(ws[k].dtype)
                   for k in range(16))
    if padded_in:
        # the pre-pad's pad region is zeros and its adjoint slices it away,
        # so zero pad-grads are the consistent cotangent
        dws_st = pad_stage2_ws(dws_st, num_heads)
    return (g.astype(x.dtype), dmods_st, dws_st, dfin, None)


_fused_trunk_pallas.defvjp(_ft_fwd, _ft_bwd)


def _trunk_final_xla(h_padded, modf, wfin, bfin, T, L, C):
    """FinalLayer math (bit-identical to models.layers.FinalLayer) applied
    to the padded trunk, emitting the kernel-fold's (B, Tp, L*OP) f32
    layout. Used by the fallback path and as the fold's VJP backward."""
    B, Tp, _ = h_padded.shape
    out = wfin.shape[1]
    OP = -(-out // 128) * 128
    h = _unpad_trunk(h_padded, T, L, C)
    sh, sc = jnp.split(modf, 2, axis=-1)
    x32 = h.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    hn = ((x32 - mean) * jax.lax.rsqrt(var + _LN_EPS)).astype(h.dtype)
    hn = hn * (1 + sc[:, None]) + sh[:, None]
    y = (hn @ wfin.astype(h.dtype) + bfin.astype(h.dtype)).astype(jnp.float32)
    y = y.reshape(B, T, L, out)
    y = jnp.pad(y, ((0, 0), (0, Tp - T), (0, 0), (0, OP - out)))
    return y.reshape(B, Tp, L * OP)


def _embed_xla(xc, wlat_p, cadd, enc, L: int, C: int):
    """XLA twin of the kernel's folded embed stage (bit-identical op order):
    per-residue lane-block latent projection on the flat carry + the
    precomputed constant add (+ encoder row)."""
    P = wlat_p.shape[0]
    xb = xc.astype(wlat_p.dtype)
    h = cadd + jnp.concatenate(
        [jax.lax.dot_general(xb[:, :, l * P:(l + 1) * P], wlat_p,
                             (((2,), (0,)), ((), ())))
         for l in range(L)], axis=-1)
    if enc is not None:
        h = h + enc.reshape(h.shape[0], 1, L * C)
    return h


def fused_trunk(x, mods, ws, mask, *, num_heads: int, tl: tuple,
                force_xla: bool = False, force_pallas: bool = False,
                final=None, embed=None, step_dt=None, biases=None,
                ode_steps: int = 1):
    """The ENTIRE trunk (all LatentMDGenLayers) as one op. x (B, Tp, L*C)
    frame-padded trunk; mods (B, NL*9C) — every layer's AdaLN output; ``ws``
    a 16-tuple of NL-stacked weights in fused_layer's argument order
    (wqkv_l .. bvt, scales folded; see denoiser.make_trunk_pack). One Pallas
    grid streams the layers per batch element (inter-layer activations never
    leave VMEM); ineligible shapes fall back to the per-layer
    ``fused_layer`` loop, identical math.

    ``final = (modf (B, 2C), wfin (C, out), bfin (out,))`` folds the
    FinalLayer output head into the kernel's last program — the f32 LN /
    modulate / projection never materialize on the full trunk in HBM — and
    the return becomes the latent in (B, Tp, L*OP) f32 (OP = out padded to
    128 lanes). Reference trunk loop: src/mdgen/model/latent_model.py:456-493.

    ``ode_steps = S > 1`` (with embed + final + step_dt): S euler steps in
    ONE pallas_call — grid (B, S*NL), the inter-step carry lives in a VMEM
    scratch and never touches HBM, and the per-step scan/dispatch overhead
    amortizes S-fold. ``mods`` (B, S*NL*9C), ``modf`` (B, S, 2C), ``enc``
    (B, S, L*C). Bitwise equal to S successive single-step calls."""
    import os

    from ..parallel.kernel_sharding import get_kernel_mesh, shard_map_batch0

    T, L = tl
    NL = ws[0].shape[0]
    C = (embed[1].shape[2] if embed is not None else x.shape[2]) // L
    assert embed is None or final is not None, "embed folding needs the folded head"
    assert ode_steps == 1 or (embed is not None and step_dt is not None), \
        "multi-step fold is the euler fast path (embed + final + dt)"
    env = os.environ.get("MDGEN_FUSED_LAYER", "")
    force_xla = force_xla or env == "xla"
    force_pallas = force_pallas or env == "pallas"
    wbytes = sum(int(np.prod(w.shape)) * w.dtype.itemsize for w in ws)
    use_mega = NL > 1 and (force_pallas or (
        not force_xla and jax.default_backend() == "tpu" and C % 128 == 0
        and L <= MAX_L and T <= MAX_T and wbytes <= _TRUNK_WEIGHT_BYTES
        and os.environ.get("MDGEN_FUSED_TRUNK", "") != "layer"
    ))

    has_enc = embed is not None and embed[2] is not None
    emb_args = ()
    if embed is not None:
        emb_args = (embed[0], embed[1]) + ((embed[2],) if has_enc else ())
    # precomputed loop-invariant mask biases (make_trunk_biases): only the
    # inference scan fast path supplies them — training recomputes per call
    assert biases is None or embed is not None
    bias_args = tuple(biases) if biases is not None else ()

    def split_rest(rest):
        i = 0
        fin_ = emb_ = None
        if final is not None:
            fin_ = tuple(rest[i:i + 3])
            i += 3
        if embed is not None:
            emb_ = (rest[i], rest[i + 1], rest[i + 2] if has_enc else None)
            i += 3 if has_enc else 2
        if biases is not None:
            return fin_, emb_, tuple(rest[i:-3]), rest[-3], tuple(rest[-2:])
        return fin_, emb_, tuple(rest[i:-1]), rest[-1], None

    def per_layer(x_, mods_, *rest):
        fin_, emb_, ws_, mask_, _ = split_rest(rest)
        ws_ = unpad_stage2_ws(ws_, num_heads)  # fused_layer takes raw
        B_ = x_.shape[0]
        xc = x_
        for s in range(ode_steps):
            if emb_ is not None:
                enc_s = None
                if emb_[2] is not None:
                    enc_s = (emb_[2].reshape(B_, ode_steps, -1)[:, s]
                             if ode_steps > 1 else emb_[2])
                h = _embed_xla(xc, emb_[0], emb_[1], enc_s, L, C)
            else:
                h = xc
            mods_s = mods_.reshape(B_, ode_steps, NL * 9 * C)[:, s]
            for i in range(NL):
                h = fused_layer(h, mods_s[:, i * 9 * C:(i + 1) * 9 * C],
                                *(w[i] for w in ws_), mask_,
                                num_heads=num_heads, tl=(T, L),
                                force_xla=force_xla, padded_io=True)
            if fin_ is None:
                return h
            modf_s = (fin_[0].reshape(B_, ode_steps, -1)[:, s]
                      if ode_steps > 1 else fin_[0])
            out = _trunk_final_xla(h, modf_s, fin_[1], fin_[2], T, L, C)
            if step_dt is None:
                return out
            # pad rows differ from the kernel fold (the XLA head zeroes
            # them before the axpy) — no valid output reads them
            xc = xc + step_dt * out
        return xc

    fin_args = tuple(final) if final is not None else ()

    if use_mega:
        interp = jax.default_backend() != "tpu"

        def local(x_, mods_, *rest):
            fin_, emb_, ws_, mask_, biases_ = split_rest(rest)
            if emb_ is not None:
                # inference scan fast path: no VJP surface, call the kernel
                # directly (training uses the plain trunk + XLA embed)
                return _trunk_call(x_, mods_, ws_, mask_, num_heads, T, L,
                                   interpret=interp, final=fin_, embed=emb_,
                                   step_dt=step_dt, biases=biases_,
                                   ode_steps=ode_steps)
            return _fused_trunk_pallas(x_, mods_, ws_, fin_, mask_,
                                       num_heads, T, L, interp)

        if jax.device_count() > 1 or get_kernel_mesh() is not None:
            # modf is batched (B, 2C); wfin/bfin replicated; the embed fold's
            # cadd/enc are batched, wlat replicated; biases batched
            batched = (True, True) \
                + ((True, False, False) if final is not None else ()) \
                + ((False, True) + ((True,) if has_enc else ()) if embed is not None else ()) \
                + (False,) * 16 + (True,) + (True,) * len(bias_args)
            out = shard_map_batch0(local, batched, x, mods, *fin_args,
                                   *emb_args, *ws, mask, *bias_args)
            if out is not None:
                return out
            if not force_pallas:
                return per_layer(x, mods, *fin_args, *emb_args, *ws, mask,
                                 *bias_args)
        return local(x, mods, *fin_args, *emb_args, *ws, mask, *bias_args)
    return per_layer(x, mods, *fin_args, *emb_args, *ws, mask, *bias_args)
