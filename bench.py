"""Benchmark: denoiser throughput at the 4AA crop-4 config on one TPU chip.

Measures batched forward passes of the flagship denoiser (5 layers, embed 384,
16 heads, prepend-IPA — reference model scale, src/mdgen/parsing.py:86-93) at
crop 4 x 100 frames in bf16, and reports denoiser steps/sec/chip where one
step = one trajectory sample denoised once (batch counts as B steps, as in
batched ODE sampling). Baseline target: 10,000 steps/sec/chip (BASELINE.md).

Prints exactly ONE JSON line.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mdgen_finetune_tpu.config import DataConfig, MDGenConfig, ModelConfig, TaskConfig
from mdgen_finetune_tpu.geometry.rigid import Rigid
from mdgen_finetune_tpu.models import LatentMDGen

BASELINE = 10_000.0


def main():
    # B = 64 is the measured throughput peak (B = 32/64/128 -> 9,931 /
    # 9,940 / 9,919 steps/s: the kernel is linear in rows, fixed per-step
    # work amortizes to B~64, and per-row cost creeps up past it)
    B, T, L = 64, 100, 4
    cfg = MDGenConfig(
        model=ModelConfig(prepend_ipa=True, abs_pos_emb=True, use_bf16=True),
        data=DataConfig(num_frames=T, crop=L),
        task=TaskConfig(sim_condition=True),
    )
    model = LatentMDGen(cfg, cfg.latent_dim, dtype=jnp.bfloat16)

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

    N_STEPS = 100  # the flagship 4AA config's inference-step count (suffix
    # _i100, reference README.md:50-56) — the product samples with 100
    # dependent denoiser steps per trajectory

    from mdgen_finetune_tpu.models.denoiser import flat_to_latent, latent_to_flat

    P = -(-cfg.latent_dim // 128) * 128

    @jax.jit
    def euler_chain(params, x0):
        # the product's sampling loop shape (transport/samplers.py sample_ode
        # + InferenceEngine._sample flat-latent fast path): N_STEPS dependent
        # denoiser applications inside one lax.scan — no per-step host
        # dispatch; the trunk weight pack and the per-step-constant embed
        # terms are hoisted out of the scan; the carry stays in the padded
        # trunk layout and the euler update folds into the trunk kernel
        # (ode_dt), so each step is one trunk pallas_call + the fused
        # encoder + the t-embedder chain — exactly as _sample does
        dt = 1.0 / N_STEPS
        pack = model.apply(params, method=model.make_trunk_pack)
        consts = model.apply(params, x_cond, x_cond_mask, mask, aatype=aatype,
                             start_frames=frames, end_frames=frames,
                             method=model.make_scan_consts)
        ts = jnp.linspace(0.05, 0.95, N_STEPS)[:, None] * jnp.ones((1, B), jnp.float32)
        # the whole t-embedder chain precomputed in one batched call (the t
        # grid is known before the scan) and fed per step via scan xs; with
        # t_emb given, the t argument itself is unused by the fast path — a
        # loop-invariant dummy avoids a per-step ts slice. The prepend-IPA
        # encoder is likewise precomputed for the whole grid in chunk-batched
        # kernel calls (denoiser.encode_steps, r4 — the latency-bound
        # per-step kernel amortized), exactly as InferenceEngine._sample
        # does.
        tembs = model.apply(params, ts, method=model.embed_times)
        encs = model.apply(params, ts, mask, consts, pack, start_frames=frames,
                           end_frames=frames, aatype=aatype,
                           method=model.encode_steps)
        # whole-t-grid AdaLN rows (embed_mods, r5): with encode_steps this
        # makes each euler step exactly ONE trunk pallas_call — bitwise-
        # equal output, 9,955 -> 10,018 steps/s measured
        modss = model.apply(params, tembs, pack, method=model.embed_mods)
        t_dummy = jnp.zeros((B,), jnp.float32)

        def step(xc, xs_row):
            mo, en = xs_row
            return model.apply(
                params, xc, t_dummy, mask, start_frames=frames, end_frames=frames,
                aatype=aatype, trunk_pack=pack, scan_consts=consts, ode_dt=dt,
                enc=en, mods=mo,
            ), ()

        # unroll=2 overlaps the per-step XLA glue with the previous step's
        # trunk kernel (+1.9% measured r5: 9,769 -> 9,957); matches the
        # shipped InferenceEngine._sample scan
        xT, _ = jax.lax.scan(step, latent_to_flat(x0, P), (modss, encs),
                             unroll=2)
        return flat_to_latent(xT, T, L, cfg.latent_dim)

    euler_chain(params, x).block_until_ready()  # compile

    # Hardened protocol (VERDICT r4 item 1): the one-shot timed region had a
    # noise floor (~2.5% builder-vs-driver spread) comparable to the gate
    # margin. Run N_REGIONS independent timed regions with FRESH inputs each
    # (the remote-execution relay caches results for repeated
    # (executable, args) pairs, which would inflate the number) and report
    # the MEDIAN plus the min/max spread as JSON fields. Within a region,
    # pipelined calls amortize the single end sync (~25 ms tunnel RTT,
    # PERF.md "relay measurement gotchas") to < 0.4% of the timed region
    # (measured: 4 -> 8 -> 12 chains = 9,646 / 9,792 / 9,835 steps/s —
    # converging to the device-limit 1/span).
    n_calls, n_regions = 10, 5
    # one UNTIMED warmup region: the first region after compile consistently
    # reads ~1% low (cold relay/chip state — r5s2: 9,915 vs 10,016-10,019
    # for regions 2-5) and would otherwise drag the reported min/spread
    warm = [euler_chain(params, jnp.asarray(rng.normal(size=x.shape), jnp.float32))
            for _ in range(2)]
    jax.block_until_ready(warm)
    region_rates = []
    for _ in range(n_regions):
        xs = [jnp.asarray(rng.normal(size=x.shape), jnp.float32) for _ in range(n_calls)]
        jax.block_until_ready(xs)  # uploads land before the timed region
        start = time.perf_counter()
        outs = [euler_chain(params, xs[i]) for i in range(n_calls)]
        jax.block_until_ready(outs)
        region_rates.append(B * n_calls * N_STEPS / (time.perf_counter() - start))

    steps_per_sec = float(np.median(region_rates))
    spread_pct = 100.0 * (max(region_rates) - min(region_rates)) / steps_per_sec
    elapsed = B * n_calls * N_STEPS / steps_per_sec  # median-region seconds

    atlas_ms = _atlas_forward_ms()
    # roofline context (PERF.md): the trunk kernel's padded bf16 matmul
    # floor is 13.4 us per (batch-element, layer) program, so the B=64
    # 5-layer step floors at 4.29 ms; padded-MFU = floor / measured step
    step_ms = 1000.0 * elapsed / (n_calls * N_STEPS)
    floor_ms = 5 * B * 13.4e-3
    print(
        json.dumps(
            {
                "metric": "denoiser steps/sec/chip (4AA crop-4, T=100, bf16, B=64, 100-step chain)",
                "value": round(steps_per_sec, 1),
                "unit": "steps/sec/chip",
                "vs_baseline": round(steps_per_sec / BASELINE, 3),
                "regions": [round(r, 1) for r in region_rates],
                "region_min": round(min(region_rates), 1),
                "region_max": round(max(region_rates), 1),
                "spread_pct": round(spread_pct, 2),
                "atlas_fwd_ms": round(atlas_ms, 2),
                "atlas_steps_per_sec": round(1000.0 / atlas_ms, 1),
                "step_ms": round(step_ms, 4),
                "trunk_matmul_floor_ms": round(floor_ms, 3),
                "padded_mfu": round(floor_ms / step_ms, 3),
                "chip_calibration_tflops": round(_chip_calibration_tflops(), 1),
            }
        )
    )


def _chip_calibration_tflops():
    """Fixed bf16 matmul-chain probe (2048^3, 64 dependent matmul pairs):
    a chip/session-state fingerprint recorded with every bench capture so
    across-session spread (~2.5% observed r3-r5 on identical code, PERF.md
    r5) can be attributed to chip state vs code. Compare ONLY against other
    sessions' values of this same field (r5: 95.6)."""
    rng = np.random.default_rng(7)
    M = K = N = 2048
    chain, iters = 32, 4
    a = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(K, N)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(N, K)) * 0.02, jnp.bfloat16)

    @jax.jit
    def chainf(a):
        def body(x, _):
            y = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            x = jax.lax.dot_general(y, w2, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return x, ()
        return jax.lax.scan(body, a, None, length=chain)[0]

    chainf(a).block_until_ready()
    xs = [jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16) for _ in range(iters)]
    jax.block_until_ready(xs)
    t0 = time.perf_counter()
    outs = [chainf(x) for x in xs]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    return 2 * 2 * M * K * N * chain / dt / 1e12


def _atlas_forward_ms():
    """Secondary tracked metric (BASELINE.md): ATLAS crop-256 forward,
    T=250, B=1 — the reference's monomer config (README.md:90-98)."""
    B, T, L = 1, 250, 256
    cfg = MDGenConfig(
        model=ModelConfig(prepend_ipa=True, abs_pos_emb=True, use_bf16=True),
        data=DataConfig(num_frames=T, crop=L),
        task=TaskConfig(sim_condition=True),
    )
    model = LatentMDGen(cfg, cfg.latent_dim, dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
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
    n_steps, n_calls = 10, 2

    @jax.jit
    def chain(params, x0):
        pack = model.apply(params, method=model.make_trunk_pack)

        def step(xc, tk):
            v = model.apply(
                params, xc, tk, mask, start_frames=frames, end_frames=frames,
                x_cond=x_cond, x_cond_mask=x_cond_mask, aatype=aatype,
                trunk_pack=pack,
            )
            return xc + (1.0 / n_steps) * v.astype(xc.dtype), ()

        ts = jnp.linspace(0.05, 0.95, n_steps)[:, None] * jnp.ones((1, B), jnp.float32)
        xT, _ = jax.lax.scan(step, x0, ts)
        return xT

    chain(params, x).block_until_ready()
    xs = [jnp.asarray(rng.normal(size=x.shape), jnp.float32) for _ in range(n_calls)]
    jax.block_until_ready(xs)
    start = time.perf_counter()
    outs = [chain(params, xs[i]) for i in range(n_calls)]
    jax.block_until_ready(outs)
    return 1000.0 * (time.perf_counter() - start) / (n_calls * n_steps)


if __name__ == "__main__":
    main()
