"""Sweep bench.py's (B, N_STEPS) over the relay to locate the throughput knee.

Same protocol as bench.py (distinct inputs, pipelined calls, one end sync);
prints steps/sec/chip per config. Run solo on the TPU.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from mdgen_finetune_tpu.config import DataConfig, MDGenConfig, ModelConfig, TaskConfig
from mdgen_finetune_tpu.geometry.rigid import Rigid
from mdgen_finetune_tpu.models import LatentMDGen


def measure(B, T, L, n_steps, n_calls):
    cfg = MDGenConfig(
        model=ModelConfig(prepend_ipa=True, abs_pos_emb=True, use_bf16=True),
        data=DataConfig(num_frames=T, crop=L),
        task=TaskConfig(sim_condition=True),
    )
    model = LatentMDGen(cfg, cfg.latent_dim, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, L, cfg.latent_dim)), jnp.float32)
    mask = jnp.ones((B, T, L), jnp.float32)
    frames = Rigid.identity((B, L))
    aatype = jnp.asarray(rng.integers(0, 20, size=(B, L)), jnp.int32)
    x_cond = jnp.zeros_like(x)
    x_cond_mask = jnp.zeros((B, T, L), jnp.int32)
    t = jnp.asarray(rng.uniform(0.1, 0.9, size=(B,)), jnp.float32)

    params = jax.jit(model.init)(
        jax.random.key(0), x, t, mask, start_frames=frames, end_frames=frames,
        x_cond=x_cond, x_cond_mask=x_cond_mask, aatype=aatype,
    )

    @jax.jit
    def euler_chain(params, x0):
        dt = 1.0 / n_steps

        def step(xc, tk):
            v = model.apply(
                params, xc, tk, mask, start_frames=frames, end_frames=frames,
                x_cond=x_cond, x_cond_mask=x_cond_mask, aatype=aatype,
            )
            return xc + dt * v.astype(xc.dtype), ()

        ts = jnp.linspace(0.05, 0.95, n_steps)[:, None] * jnp.ones((1, B), jnp.float32)
        xT, _ = jax.lax.scan(step, x0, ts)
        return xT

    euler_chain(params, x).block_until_ready()
    xs = [jnp.asarray(rng.normal(size=x.shape), jnp.float32) for _ in range(n_calls)]
    jax.block_until_ready(xs)
    start = time.perf_counter()
    outs = [euler_chain(params, xs[i]) for i in range(n_calls)]
    jax.block_until_ready(outs)
    elapsed = time.perf_counter() - start
    sps = B * n_calls * n_steps / elapsed
    print(f"B={B:<4d} n_steps={n_steps:<4d} n_calls={n_calls:<3d} "
          f"steps/s={sps:8.1f}  ms/fwd={1000 * elapsed / (n_calls * n_steps):6.3f}",
          flush=True)
    return sps


if __name__ == "__main__":
    if len(sys.argv) > 1:
        # explicit configs: B,T,L,n_steps,n_calls per arg
        for a in sys.argv[1:]:
            B, T, L, n_steps, n_calls = (int(v) for v in a.split(","))
            measure(B, T, L, n_steps, n_calls)
    else:
        for B, n_steps, n_calls in [
            (32, 8, 8),      # current bench config (reference point)
            (32, 32, 4),     # amortize per-call overhead
            (32, 100, 2),    # reference _i100 inference-step count
            (64, 32, 4),
            (128, 32, 2),
        ]:
            measure(B, 100, 4, n_steps, n_calls)
