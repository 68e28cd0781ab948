"""Probe-ledger ablation for the blocked whole-block kernels at the ATLAS
shape (VERDICT r4 item 3: "apply the 4AA probe discipline to the blocked
kernels' ~4.2 us/program VPU excess").

Times `_block_pallas_fwd_blocked` (frame attention, grid (B, L)) and
`_block_pallas_fwd_blocked_rows` (residue attention, grid (B, T)) under the
stage probes threaded through `_block_kernel_blocked` / `_grouped_attend`:

  ""   baseline                       "l"  LN lane-stats skipped
  "R"  rope skipped                   "V"  logits+softmax skipped (uniform p)
  "E"  exp2 -> subtract (exp cost)    "b"  bf16 logits surface
  "s"  softmax denominator skipped    "H"  2x-wide head groups (EXACT math)
  "F"  masked head-collapse skipped   "P"  PV + out-proj skipped

Timing protocol (PERF.md "relay measurement gotchas"): the per-call device
time (~1.8 ms) is below the relay's ~1 ms dispatch floor, so each variant is
timed as a jitted DEPENDENT CHAIN of S applications (output feeds input) —
one dispatch, S kernel executions back-to-back on device — with distinct
pre-uploaded inputs per timed call. jax.profiler is not used (it hung
through the relay in the r5 session).

Usage: python tools/blocked_ablation.py [--S 30] [--iters 3] \
           [--variants ,l,R,V,E,H] [--kernel blocked|rows|both]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mdgen_finetune_tpu.ops.time_attention import (
    LOG2E,
    _block_pallas_fwd_blocked,
    _block_pallas_fwd_blocked_rows,
)


def make_inputs(B, T, L, C, H, seed=0):
    rng = np.random.default_rng(seed)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(B, T * L, C)) * 0.5, dt)
    sh = jnp.asarray(rng.normal(size=(B, C)) * 0.1, dt)
    sc = jnp.asarray(rng.normal(size=(B, C)) * 0.1, dt)
    g = jnp.asarray(rng.normal(size=(B, C)) * 0.1, dt)
    D = C // H
    scale = (1.0 / np.sqrt(D)) * LOG2E
    wqkv = np.asarray(rng.normal(size=(C, 3 * C)) * 0.02)
    wqkv[:, :C] *= scale  # q pre-scaled, as the module fold does
    wqkv = jnp.asarray(wqkv, dt)
    bqkv = jnp.asarray(rng.normal(size=(3 * C,)) * 0.01, dt)
    wout = jnp.asarray(rng.normal(size=(C, C)) * 0.02, dt)
    bout = jnp.asarray(rng.normal(size=(C,)) * 0.01, dt)
    bias_k = jnp.asarray(rng.normal(size=(C,)) * 0.02, dt)
    bias_v = jnp.asarray(rng.normal(size=(C,)) * 0.02, dt)
    return x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v


def time_variant(fn_one, x0, S, iters, seed=100):
    """fn_one: x -> x (same shape). Jit a dependent chain of S applications."""
    @jax.jit
    def chain(x):
        def body(xc, _):
            return fn_one(xc), ()
        return jax.lax.scan(body, x, None, length=S)[0]

    chain(x0).block_until_ready()  # compile
    rng = np.random.default_rng(seed)
    xs = [jnp.asarray(rng.normal(size=x0.shape) * 0.5, x0.dtype)
          for _ in range(iters)]
    jax.block_until_ready(xs)
    t0 = time.perf_counter()
    outs = [chain(x) for x in xs]
    jax.block_until_ready(outs)
    return 1000.0 * (time.perf_counter() - t0) / (iters * S)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=1)
    ap.add_argument("--T", type=int, default=250)
    ap.add_argument("--L", type=int, default=256)
    ap.add_argument("--C", type=int, default=384)
    ap.add_argument("--H", type=int, default=16)
    ap.add_argument("--S", type=int, default=30)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--variants", type=str, default=",l,R,lR,V,E,b,s,H,F")
    ap.add_argument("--kernel", type=str, default="both",
                    choices=["blocked", "rows", "both"])
    args = ap.parse_args()

    B, T, L, C, H = args.B, args.T, args.L, args.C, args.H
    x, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v = make_inputs(B, T, L, C, H)
    kv_blocked = jnp.ones((B, L, T), jnp.float32)
    kv_rows = jnp.ones((B, T, L), jnp.float32)
    variants = args.variants.split(",")

    def frame_one(probes):
        def f(xc):
            # wrapper returns (B, T*L, C) — same layout in and out
            return _block_pallas_fwd_blocked(
                xc, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v,
                kv_blocked, num_heads=H, T=T, L=L, probes=probes)
        return f

    def rows_one(probes):
        def f(xc):
            return _block_pallas_fwd_blocked_rows(
                xc, sh, sc, g, wqkv, bqkv, wout, bout, bias_k, bias_v,
                kv_rows, num_heads=H, T=T, L=L, probes=probes)
        return f

    print(f"# blocked ablation B={B} T={T} L={L} C={C} H={H} "
          f"S={args.S} iters={args.iters}")
    results = {}
    sel = {"blocked": "frame(blocked)", "rows": "res(rows)"}.get(args.kernel)
    for kname, maker in (("frame(blocked)", frame_one), ("res(rows)", rows_one)):
        if sel is not None and kname != sel:
            continue
        base = None
        for v in variants:
            ms = time_variant(maker(v), x, args.S, args.iters)
            if v == "":
                base = ms
            delta = f"  ({ms - base:+.3f} vs base)" if base is not None and v else ""
            print(f"{kname:15s} probes={v or '-':4s} {ms:7.3f} ms/call{delta}",
                  flush=True)
            results[(kname, v)] = ms
    return results


if __name__ == "__main__":
    main()
