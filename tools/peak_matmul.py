"""Measure the chip's achievable bf16 matmul throughput at given shapes.

The perf roadmap needs a real roofline: PERF.md's "100% MFU" math used the
v5e datasheet peak, but the kernel-sizing decisions need the ACHIEVABLE
TFLOP/s at the kernel's own matmul shapes (M rows per program, K/N of the
projections). Traces a chain of dependent matmuls per shape and prints
device-time-based TFLOP/s.

Usage: python tools/peak_matmul.py [--shapes M,K,N[;M,K,N...]] [--iters 8]
"""
import argparse
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_ms(outdir):
    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True),
                   key=os.path.getmtime)
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    tid_names = {(e["pid"], e["tid"]): e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "thread_name"}
    tot = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        tn = tid_names.get((e["pid"], e["tid"]), "")
        if "XLA Modules" in tn or "Steps" in tn:
            continue
        tot += e.get("dur", 0) / 1e3
    return tot


DEFAULT = "4096,4096,4096;416,384,1536;832,384,1536;1664,384,1536;416,1536,384;832,1536,384;416,384,1152;832,384,1152;416,512,384"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default=DEFAULT)
    ap.add_argument("--chain", type=int, default=64, help="dependent matmuls per call")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    for spec in args.shapes.split(";"):
        M, K, N = (int(v) for v in spec.split(","))
        a = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(size=(K, N)) * 0.02, jnp.bfloat16)
        w2 = jnp.asarray(rng.normal(size=(N, K)) * 0.02, jnp.bfloat16)

        @jax.jit
        def chain(a, w1=w1, w2=w2):
            def body(x, _):
                y = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                x = jax.lax.dot_general(y, w2, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                return x, ()
            x, _ = jax.lax.scan(body, a, None, length=args.chain)
            return x

        chain(a).block_until_ready()
        xs = [jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16) for _ in range(args.iters)]
        jax.block_until_ready(xs)
        outdir = f"/tmp/peak_{M}_{K}_{N}"
        os.makedirs(outdir, exist_ok=True)
        with jax.profiler.trace(outdir):
            outs = [chain(x) for x in xs]
            jax.block_until_ready(outs)
        ms = device_ms(outdir) / args.iters
        flops = 2 * 2 * M * K * N * args.chain  # 2 matmuls per chain step
        tf = flops / (ms / 1e3) / 1e12
        print(f"M={M:6d} K={K:5d} N={N:5d}  {ms:8.3f} ms/chain  {tf:7.1f} TFLOP/s")


if __name__ == "__main__":
    main()
