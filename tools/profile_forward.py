"""Device-op profile of the flagship denoiser forward (or train step) on TPU.

Runs the bench config (or an override via flags), captures a jax.profiler
trace, and prints a per-op-category time budget parsed from the trace JSON —
the measurement behind PERF.md's "where the time goes" tables. Standalone
wall-clock through the execution relay is dispatch-dominated (~1 ms/call), so
this trace-based view is the only trustworthy sub-ms profile (PERF.md
"relay measurement gotchas").

Usage:
    python tools/profile_forward.py [--B 32] [--T 100] [--L 4] [--train]
                                    [--steps 3] [--outdir /tmp/jaxprof]
"""
import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class FwdHandle:
    """Callable jitted forward + the model/config it was built from."""

    def __init__(self, fn, model, aux):
        self.fn, self.model_and_aux = fn, (model, aux)

    def __call__(self, *a, **k):
        return self.fn(*a, **k)


def build_forward(B, T, L, bf16=True):
    import jax
    import jax.numpy as jnp

    from mdgen_finetune_tpu.config import DataConfig, MDGenConfig, ModelConfig, TaskConfig
    from mdgen_finetune_tpu.geometry.rigid import Rigid
    from mdgen_finetune_tpu.models import LatentMDGen

    cfg = MDGenConfig(
        model=ModelConfig(prepend_ipa=True, abs_pos_emb=True, use_bf16=bf16),
        data=DataConfig(num_frames=T, crop=L),
        task=TaskConfig(sim_condition=True),
    )
    model = LatentMDGen(cfg, cfg.latent_dim, dtype=jnp.bfloat16 if bf16 else jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, L, cfg.latent_dim)), jnp.float32)
    t = jnp.asarray(rng.uniform(0.1, 0.9, size=(B,)), jnp.float32)
    mask = jnp.ones((B, T, L), jnp.float32)
    frames = Rigid.identity((B, L))
    aatype = jnp.asarray(rng.integers(0, 20, size=(B, L)), jnp.int32)
    x_cond = jnp.zeros_like(x)
    x_cond_mask = jnp.zeros((B, T, L), jnp.int32)
    params = jax.jit(model.init)(
        jax.random.key(0), x, t, mask, start_frames=frames, end_frames=frames,
        x_cond=x_cond, x_cond_mask=x_cond_mask, aatype=aatype,
    )

    @jax.jit
    def fwd(params, x):
        return model.apply(
            params, x, t, mask, start_frames=frames, end_frames=frames,
            x_cond=x_cond, x_cond_mask=x_cond_mask, aatype=aatype,
        )

    fwd = FwdHandle(fwd, model, (mask, frames, aatype, x_cond, x_cond_mask, cfg))
    return fwd, params, x


def build_train_step(B, T, L, bf16=True):
    import jax
    import jax.numpy as jnp

    from mdgen_finetune_tpu.config import (
        DataConfig, MDGenConfig, ModelConfig, TaskConfig, TrainConfig, TransportConfig,
    )
    from mdgen_finetune_tpu.data.synthetic import synthesize_trajectory
    from mdgen_finetune_tpu.training import Trainer

    cfg = MDGenConfig(
        model=ModelConfig(prepend_ipa=True, abs_pos_emb=True, use_bf16=bf16,
                          grad_checkpointing=T > 256),
        transport=TransportConfig(),
        data=DataConfig(num_frames=T, crop=L),
        task=TaskConfig(sim_condition=True),
        train=TrainConfig(batch_size=B, dp_size=1, sp_size=1),
    )
    trainer = Trainer(cfg)
    seq = "AAGH"
    atom14 = np.stack([synthesize_trajectory(seq, T, seed=i).astype(np.float32) for i in range(B)])
    batch = {
        "atom14": atom14,
        "seqres": np.tile(np.array([0, 0, 7, 6], np.int32), (B, 1)),
        "mask": np.ones((B, L), np.float32),
    }
    import jax

    state = trainer.init_state(jax.random.key(0), batch)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}

    def step(state, key):
        return trainer.train_step(state, dev_batch, key)

    return step, state


def device_span(outdir):
    """(sum_of_device_op_ms, wall_span_ms) from the newest trace — the gap
    between them is device idle time (scheduling bubbles)."""
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
    tot, t0, t1 = 0.0, None, None
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        tn = tid_names.get((e["pid"], e["tid"]), "")
        if "XLA Modules" in tn or "Steps" in tn:
            continue
        tot += e.get("dur", 0) / 1e3
        s, d = e.get("ts", 0), e.get("dur", 0)
        t0 = s if t0 is None else min(t0, s)
        t1 = s + d if t1 is None else max(t1, s + d)
    return tot, (t1 - t0) / 1e3 if t0 is not None else 0.0


def summarize_trace(outdir, top=40):
    """Parse the newest trace.json.gz and bucket device-op durations."""
    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True),
                   key=os.path.getmtime)
    if not paths:
        print("no trace found under", outdir)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pids whose process name mentions TPU/device XLA ops
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

    per_op = defaultdict(float)
    per_cat = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        if "XLA Op" not in tname and "Steps" not in tname and tname != "":
            # keep only op-level lanes; skip step/module summary lanes
            if "XLA Modules" in tname or "Steps" in tname:
                continue
        if "XLA Modules" in tname or "Steps" in tname:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        per_op[name] += dur
        cat = name.split(".")[0].split("_fusion")[0]
        # bucket by leading op kind
        for key in ("fusion", "copy", "convert", "reduce", "convolution", "slice",
                    "pad", "broadcast", "reshape", "transpose", "dot", "custom-call",
                    "dynamic", "bitcast", "concatenate", "select", "iota", "scatter",
                    "gather", "all-reduce", "all-gather", "all-to-all"):
            if name.startswith(key):
                cat = key
                break
        else:
            cat = name.split(".")[0]
        per_cat[cat] += dur
        total += dur

    print(f"\n== device-op totals ({paths[-1].split('/')[-1]}) ==")
    print(f"total device time: {total:.3f} ms (across all traced iterations)")
    print("\n-- by category --")
    for k, v in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        if v > total * 0.002:
            print(f"{v:10.3f} ms  {k}")
    print(f"\n-- top {top} ops --")
    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{v:10.3f} ms  {k[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=32)
    ap.add_argument("--T", type=int, default=100)
    ap.add_argument("--L", type=int, default=4)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--scan", type=int, default=0,
                    help="profile an N-step euler scan (the bench shape) instead of bare forwards")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--outdir", default="/tmp/jaxprof")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()

    if args.parse_only:
        summarize_trace(args.outdir)
        return

    import jax
    import jax.numpy as jnp

    os.makedirs(args.outdir, exist_ok=True)
    rng = np.random.default_rng(1)

    if args.train:
        step, state = build_train_step(args.B, args.T, args.L)
        keys = [jax.random.key(i + 1) for i in range(args.steps + 1)]
        state, m = step(state, keys[0])  # compile
        jax.block_until_ready(m)
        with jax.profiler.trace(args.outdir):
            for i in range(args.steps):
                state, m = step(state, keys[i + 1])
            jax.block_until_ready(m)
    elif args.scan:
        # mirrors bench.py's euler_chain: the flat-latent fast path with the
        # embed + euler update folded into the trunk kernel
        fwd, params, x = build_forward(args.B, args.T, args.L)
        model, aux = fwd.model_and_aux  # set by build_forward below
        mask, frames, aatype, x_cond, x_cond_mask, cfg = aux
        from mdgen_finetune_tpu.models.denoiser import flat_to_latent, latent_to_flat
        n = args.scan
        B, T, L = args.B, args.T, args.L
        P = -(-cfg.latent_dim // 128) * 128

        @jax.jit
        def euler_chain(params, x0):
            dt = 1.0 / n
            pack = model.apply(params, method=model.make_trunk_pack)
            consts = model.apply(params, x_cond, x_cond_mask, mask, aatype=aatype,
                                 start_frames=frames, end_frames=frames,
                                 method=model.make_scan_consts)
            ts = jnp.linspace(0.05, 0.95, n)[:, None] * jnp.ones((1, B), jnp.float32)
            tembs = model.apply(params, ts, method=model.embed_times)

            def step(xc, xs_row):
                tk, te = xs_row
                return model.apply(
                    params, xc, tk, mask, start_frames=frames, end_frames=frames,
                    aatype=aatype, trunk_pack=pack, scan_consts=consts, ode_dt=dt,
                    t_emb=te,
                ), ()

            xT, _ = jax.lax.scan(step, latent_to_flat(x0, P), (ts, tembs))
            return flat_to_latent(xT, T, L, cfg.latent_dim)

        euler_chain(params, x).block_until_ready()
        xs = [jnp.asarray(rng.normal(size=x.shape), jnp.float32) for _ in range(args.steps)]
        jax.block_until_ready(xs)
        with jax.profiler.trace(args.outdir):
            outs = [euler_chain(params, xs[i]) for i in range(args.steps)]
            jax.block_until_ready(outs)
        tot, span = device_span(args.outdir)
        per = args.steps * n
        print(f"device op-sum {tot:.3f} ms, span {span:.3f} ms over {per} forwards")
        print(f"-> {tot/per:.3f} ms/fwd busy, {span/per:.3f} ms/fwd span, idle {(span-tot)/per:.3f} ms/fwd")

    else:
        fwd, params, x = build_forward(args.B, args.T, args.L)
        fwd(params, x).block_until_ready()  # compile
        xs = [jnp.asarray(rng.normal(size=x.shape), jnp.float32) for _ in range(args.steps)]
        jax.block_until_ready(xs)
        with jax.profiler.trace(args.outdir):
            outs = [fwd(params, xs[i]) for i in range(args.steps)]
            jax.block_until_ready(outs)

    summarize_trace(args.outdir)


if __name__ == "__main__":
    main()
