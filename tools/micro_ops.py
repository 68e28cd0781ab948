"""Micro-op cost model for the fused-layer kernel, measured on the TPU.

Each named op runs K times inside one Pallas kernel with grid (32,) (the
bench batch), tracing device time at K=2 and K=10; the marginal per-op cost
is (t10 - t2) / 8 / 32 programs. This isolates what the stage probes can't:
lane-dim concats vs row-dim concats vs dot shapes vs transcendentals.

Usage: python tools/micro_ops.py [--ops mul,exp,...]
"""
import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def kernel_ms(outdir):
    """Total device time in the most recent trace (only our op runs)."""
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True),
                   key=os.path.getmtime)
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    tot = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        if "XLA Modules" in tid_names.get((e["pid"], e["tid"]), "") or \
           "Steps" in tid_names.get((e["pid"], e["tid"]), ""):
            continue
        tot += e.get("dur", 0) / 1e3
    return tot

Tp, L, C, H = 104, 4, 384, 16
R = L * Tp
J = L + 1


def build_ops():
    import jax
    import jax.numpy as jnp

    f32 = jnp.float32

    def blk(x, i):
        return x[i * Tp:(i + 1) * Tp]

    def rot(x, k):
        # vary the input per iteration to defeat CSE: roll rows by 8*k
        return jnp.concatenate([x[8 * (k + 1):], x[:8 * (k + 1)]], axis=0)

    ops = {}

    def reg(name):
        def deco(f):
            ops[name] = f
            return f
        return deco

    # x is (R, C) bf16 from the ref; y is (R, 4C) bf16 scratch view
    @reg("mul_416x384")
    def _(x, y, k):
        return rot(x, k) * x

    @reg("fma_f32_416x384")
    def _(x, y, k):
        return rot(x, k).astype(f32) * x.astype(f32) + x.astype(f32)

    @reg("exp_f32_416x112")
    def _(x, y, k):
        return jnp.exp(rot(x, k)[:, :112].astype(f32))

    @reg("exp_f32_1664x112")
    def _(x, y, k):
        v = rot(y, k).reshape(R * 4, C)[:, :112].astype(f32)
        return jnp.exp(v)

    @reg("exp2_f32_416x112")
    def _(x, y, k):
        return jnp.exp2(rot(x, k)[:, :112].astype(f32))

    @reg("exp2_f32_1664x112")
    def _(x, y, k):
        v = rot(y, k).reshape(R * 4, C)[:, :112].astype(f32)
        return jnp.exp2(v)

    @reg("add_f32_416x112")
    def _(x, y, k):
        v = rot(x, k)[:, :112].astype(f32)
        return v + x[:1, :112].astype(f32)

    @reg("maxlane_f32_416x112")
    def _(x, y, k):
        v = rot(x, k)[:, :112].astype(f32)
        return jnp.max(v, axis=1, keepdims=True)

    @reg("sumlane_f32_416x112")
    def _(x, y, k):
        v = rot(x, k)[:, :112].astype(f32)
        return jnp.sum(v, axis=1, keepdims=True)

    @reg("lane_concat5_416x384")
    def _(x, y, k):
        xs = rot(x, k)
        return jnp.concatenate([xs, x, xs, x, xs], axis=1)

    @reg("row_tile4_104x384")
    def _(x, y, k):
        b = blk(rot(x, k), 0)
        return jnp.concatenate([b, b, b, b], axis=0)

    @reg("dot_104x384x16")
    def _(x, y, k):
        return jax.lax.dot_general(blk(rot(x, k), 0), x[:384, :16],
                                   (((1,), (0,)), ((), ())), preferred_element_type=f32)

    @reg("dot_416x384x16")
    def _(x, y, k):
        return jax.lax.dot_general(rot(x, k), x[:384, :16],
                                   (((1,), (0,)), ((), ())), preferred_element_type=f32)

    # ---- group=2 stacking probes: two independent 416-row dots vs ONE
    # 832-row dot over the row-concat of the same inputs (the concat is
    # charged to the stacked op — conservative for a kernel where the
    # stacked surface arrives from an upstream 2R-row matmul for free) ----
    def pair_vs_stack(nk):
        def getw(x, y):
            return x[:384, :nk] if nk <= 384 else y[:384, :nk]

        @reg(f"pair_dot_416x384x{nk}")
        def _(x, y, k):
            w = getw(x, y)
            d1 = jax.lax.dot_general(rot(x, k), w,
                                     (((1,), (0,)), ((), ())), preferred_element_type=f32)
            d2 = jax.lax.dot_general(rot(x, k + 11), w,
                                     (((1,), (0,)), ((), ())), preferred_element_type=f32)
            return d1 + d2

        @reg(f"stack_dot_832x384x{nk}")
        def _(x, y, k):
            a = jnp.concatenate([rot(x, k), rot(x, k + 11)], axis=0)
            d = jax.lax.dot_general(a, getw(x, y),
                                    (((1,), (0,)), ((), ())), preferred_element_type=f32)
            return d[:R] + d[R:]

    pair_vs_stack(16)
    pair_vs_stack(384)
    pair_vs_stack(1536)

    @reg("dot_416x384x384")
    def _(x, y, k):
        return jax.lax.dot_general(rot(x, k), x[:384, :384],
                                   (((1,), (0,)), ((), ())), preferred_element_type=f32)

    @reg("dot_832x384x384")
    def _(x, y, k):
        a = rot(y, k).reshape(4 * R, 384)[:832]
        return jax.lax.dot_general(a, x[:384, :384],
                                   (((1,), (0,)), ((), ())), preferred_element_type=f32)

    @reg("dot_1664x384x384")
    def _(x, y, k):
        a = rot(y, k).reshape(4 * R, 384)
        return jax.lax.dot_general(a, x[:384, :384],
                                   (((1,), (0,)), ((), ())), preferred_element_type=f32)

    @reg("dot_416x384x1536")
    def _(x, y, k):
        w = y.reshape(4 * R, 384)[:384].T.reshape(384, 1536)
        return jax.lax.dot_general(rot(x, k), w,
                                   (((1,), (0,)), ((), ())), preferred_element_type=f32)

    @reg("dot_832x384x1536")
    def _(x, y, k):
        a = rot(y, k).reshape(4 * R, 384)[:832]
        w = y.reshape(4 * R, 384)[:384].T.reshape(384, 1536)
        return jax.lax.dot_general(a, w,
                                   (((1,), (0,)), ((), ())), preferred_element_type=f32)

    @reg("dot_bf16out_416x384x1536")
    def _(x, y, k):
        w = y.reshape(4 * R, 384)[:384].T.reshape(384, 1536)
        return jax.lax.dot_general(rot(x, k), w,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.bfloat16)

    @reg("dot_416x128x112")
    def _(x, y, k):
        return jax.lax.dot_general(rot(x, k)[:, :128], x[:128, :112],
                                   (((1,), (0,)), ((), ())), preferred_element_type=f32)

    @reg("dot_1664x512x112")
    def _(x, y, k):
        a = rot(y, k).reshape(4 * R, 384)[:, :256]
        a2 = jnp.concatenate([a, a], axis=1)  # (1664, 512)
        w = y.reshape(4 * R, 384)[:512, :112]
        return jax.lax.dot_general(a2, w,
                                   (((1,), (0,)), ((), ())), preferred_element_type=f32)

    @reg("dot_416x16x384")
    def _(x, y, k):
        return jax.lax.dot_general(rot(x, k)[:, :16].astype(f32), x[:16].astype(f32),
                                   (((1,), (0,)), ((), ())), preferred_element_type=f32)

    @reg("dot_416x80x1920")
    def _(x, y, k):
        a = rot(x, k)[:, :80].astype(f32)
        w = rot(y, k).reshape(4 * R, 384)[:80, :].astype(f32)
        w5 = jnp.concatenate([w] * 5, axis=1)  # (80, 1920)
        return jax.lax.dot_general(a, w5, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    @reg("mask_stack_16x104x512")
    def _(x, y, k):
        from mdgen_finetune_tpu.ops.time_attention import _group_masks
        q = rot(y, k)[:Tp, :512]
        masks = _group_masks(32, 16, q.dtype)
        return (q[None] * masks).reshape(16 * Tp, 512)

    @reg("collapse_4x416x128")
    def _(x, y, k):
        from mdgen_finetune_tpu.ops.time_attention import _group_masks
        pv = rot(y, k).reshape(4 * R, 384)[:4 * 104, :128].astype(f32)
        masks = _group_masks(32, 4, f32)
        return jnp.sum(pv.reshape(4, 104, 128) * masks, axis=0)

    @reg("ln_f32_416x384")
    def _(x, y, k):
        x32 = rot(x, k).astype(f32)
        mean = jnp.mean(x32, axis=1, keepdims=True)
        var = jnp.mean(x32 * x32, axis=1, keepdims=True) - mean * mean
        return (x32 - mean) * jax.lax.rsqrt(var + 1e-6)

    @reg("softmax_tail_416x112")
    def _(x, y, k):
        p = rot(x, k)[:, :112].astype(f32)
        m = jnp.max(p, axis=1, keepdims=True)
        e = p - m
        return e / jnp.sum(e, axis=1, keepdims=True)

    @reg("roll_pair_416x384")
    def _(x, y, k):
        from jax.experimental.pallas import tpu as pltpu
        x32 = rot(x, k).astype(f32)
        return pltpu.roll(x32, 12, 1) + pltpu.roll(x32, 372, 1)

    @reg("slice_lane_416x384of1536")
    def _(x, y, k):
        return rot(y, k)[:, 384:768]

    return ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", default="")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    ops = build_ops()
    names = args.ops.split(",") if args.ops else list(ops)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, R, C)), jnp.bfloat16) * 0.1
    y = jnp.asarray(rng.normal(size=(32, R, 4 * C)), jnp.bfloat16) * 0.1

    results = {}
    for name in names:
        op = ops[name]
        times = {}
        for K in (2, 10):
            def kernel(x_ref, y_ref, o_ref, *, K=K, op=op):
                acc = None
                for k in range(K):
                    r = op(x_ref[0], y_ref[0], k)
                    acc = r if acc is None else acc + r
                s = jnp.sum(acc.astype(jnp.float32))
                o_ref[0, :, :] = jnp.full((1, 128), s, jnp.float32)

            f = jax.jit(lambda x, y, kern=kernel: pl.pallas_call(
                kern,
                grid=(32,),
                in_specs=[pl.BlockSpec((1, R, C), lambda b: (b, 0, 0)),
                          pl.BlockSpec((1, R, 4 * C), lambda b: (b, 0, 0))],
                out_specs=pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((32, 1, 128), jnp.float32),
            )(x, y))
            try:
                f(x, y).block_until_ready()
            except Exception as e:
                print(f"{name:28s} K={K} FAILED: {str(e)[:120]}")
                times = None
                break
            xs = [jnp.asarray(rng.normal(size=x.shape), jnp.bfloat16) for _ in range(args.iters)]
            jax.block_until_ready(xs)
            outdir = f"/tmp/micro_{name}_{K}"
            os.makedirs(outdir, exist_ok=True)
            with jax.profiler.trace(outdir):
                outs = [f(xi, y) for xi in xs]
                jax.block_until_ready(outs)
            times[K] = kernel_ms(outdir) / args.iters
        if times is None:
            continue
        marginal_us = (times[10] - times[2]) / 8 / 32 * 1e3
        results[name] = marginal_us
        print(f"{name:28s} t2={times[2]:7.3f}ms t10={times[10]:7.3f}ms "
              f"marginal {marginal_us:8.3f} us/op/program")

    print("\n== sorted ==")
    for n, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{v:8.3f} us  {n}")


if __name__ == "__main__":
    main()
