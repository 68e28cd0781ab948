"""Stage ablation of the fused whole-layer kernel: where do the 0.8 ms go?

Runs _pallas_fwd with stage subsets at the bench shape, traces each, and
prints per-variant kernel device time. Trace-based (relay wall-clock is
dispatch-dominated, PERF.md).

Usage: python tools/kernel_ablation.py [--B 32] [--T 100] [--L 4]
"""
import argparse
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def kernel_ms(outdir):
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
        tname = tid_names.get((e["pid"], e["tid"]), "")
        if "XLA Modules" in tname or "Steps" in tname:
            continue
        if e.get("name", "").startswith("_pallas_fwd"):
            tot += e.get("dur", 0) / 1e3
    return tot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=32)
    ap.add_argument("--T", type=int, default=100)
    ap.add_argument("--L", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--variants", default="123,1,2,3,12,123a,1a,2a")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mdgen_finetune_tpu.ops.fused_layer import _pallas_fwd

    B, T, L, C, H = args.B, args.T, args.L, 384, 16
    rng = np.random.default_rng(0)
    r = lambda *s, sc=0.1: jnp.asarray(rng.normal(size=s), jnp.bfloat16) * sc
    N = T * L
    x = r(B, N, C, sc=0.5)
    mod = r(B, 9 * C, sc=0.2)
    w = dict(
        wqkv_l=r(C, 3 * C), bqkv_l=r(3 * C), wout_l=r(C, C), bout_l=r(C),
        wqkv_t=r(C, 3 * C), bqkv_t=r(3 * C), wout_t=r(C, C), bout_t=r(C),
        w1=r(C, 4 * C), b1=r(4 * C), w2=r(4 * C, C), b2=r(C),
        bkl=r(1, 1, C), bvl=r(1, 1, C), bkt=r(1, 1, C), bvt=r(1, 1, C),
    )
    mask = jnp.ones((B, T, L), jnp.float32)

    for variant in args.variants.split(","):
        f = jax.jit(lambda x, stages=variant: _pallas_fwd(
            x, mod, *w.values(), mask, H, T, L, stages=stages))
        f(x).block_until_ready()
        xs = [jnp.asarray(rng.normal(size=x.shape), jnp.bfloat16) for _ in range(args.iters)]
        jax.block_until_ready(xs)
        outdir = f"/tmp/abl_{variant}"
        os.makedirs(outdir, exist_ok=True)
        with jax.profiler.trace(outdir):
            outs = [f(xi) for xi in xs]
            jax.block_until_ready(outs)
        ms = kernel_ms(outdir) / args.iters
        print(f"stages={variant:6s} kernel {ms:7.3f} ms/call")


if __name__ == "__main__":
    main()
