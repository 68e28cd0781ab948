"""Measure the multi-step fused kernel: S euler steps per pallas_call."""
import sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
from mdgen_finetune_tpu.config import DataConfig, MDGenConfig, ModelConfig, TaskConfig
from mdgen_finetune_tpu.geometry.rigid import Rigid
from mdgen_finetune_tpu.models import LatentMDGen
from mdgen_finetune_tpu.models.denoiser import flat_to_latent, latent_to_flat

B, n_calls, S = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
N_STEPS = 100
T, L = 100, 4
cfg = MDGenConfig(model=ModelConfig(prepend_ipa=True, abs_pos_emb=True, use_bf16=True),
                  data=DataConfig(num_frames=T, crop=L), task=TaskConfig(sim_condition=True))
model = LatentMDGen(cfg, cfg.latent_dim, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, T, L, cfg.latent_dim)), jnp.float32)
mask = jnp.ones((B, T, L), jnp.float32)
frames = Rigid.identity((B, L))
aatype = jnp.asarray(rng.integers(0, 20, size=(B, L)), jnp.int32)
x_cond = jnp.zeros_like(x); x_cond_mask = jnp.zeros((B, T, L), jnp.int32)
t = jnp.asarray(rng.uniform(0.1, 0.9, size=(B,)), jnp.float32)
params = jax.jit(model.init)(jax.random.key(0), x, t, mask, start_frames=frames, end_frames=frames,
                             x_cond=x_cond, x_cond_mask=x_cond_mask, aatype=aatype)
P = -(-cfg.latent_dim // 128) * 128

@jax.jit
def euler_chain(params, x0):
    dt = 1.0 / N_STEPS
    pack = model.apply(params, method=model.make_trunk_pack)
    consts = model.apply(params, x_cond, x_cond_mask, mask, aatype=aatype,
                         start_frames=frames, end_frames=frames,
                         method=model.make_scan_consts)
    ts = jnp.linspace(0.05, 0.95, N_STEPS)[:, None] * jnp.ones((1, B), jnp.float32)
    tembs = model.apply(params, ts, method=model.embed_times)  # (N, B, C)
    Cdim = tembs.shape[-1]
    ts_g = ts.reshape(N_STEPS // S, S, B)
    te_g = tembs.reshape(N_STEPS // S, S * B, Cdim)

    def step(xc, xs_row):
        tk, te = xs_row
        return model.apply(params, xc, tk, mask, consts, pack,
                           start_frames=frames, end_frames=frames, aatype=aatype,
                           ode_dt=dt, t_embs=te,
                           method=model.flat_euler_steps), ()

    xT, _ = jax.lax.scan(step, latent_to_flat(x0, P), (ts_g, te_g))
    return flat_to_latent(xT, T, L, cfg.latent_dim)

c0 = time.perf_counter()
euler_chain(params, x).block_until_ready()
print(f"compile {time.perf_counter()-c0:.1f}s")
xs = [jnp.asarray(rng.normal(size=x.shape), jnp.float32) for _ in range(n_calls)]
jax.block_until_ready(xs)
t0 = time.perf_counter()
outs = [euler_chain(params, xs[i]) for i in range(n_calls)]
jax.block_until_ready(outs)
el = time.perf_counter() - t0
print(f"B={B} n_calls={n_calls} S={S}: {round(B*n_calls*N_STEPS/el,1)} steps/s ({el:.3f}s)")
