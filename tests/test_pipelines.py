"""Pipeline wrappers (rtb/pipelines.py) vs manual scheduler loops.

The pipelines must reproduce a hand-rolled python loop over scheduler.step
exactly (same keys, same math) — the reference pipelines are the same thin
loop over their schedulers (pipeline_ddpm.py:131-147)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdgen_finetune_tpu.rtb import (DDIMGFNPipeline, DDPMDPPipeline,
                                    DDPMGFNPipeline, LDMGFNPipeline)
from mdgen_finetune_tpu.rtb.scheduler import DDPMGFNScheduler


def _toy_denoiser(x, t, shift=None):
    """Deterministic stand-in for a UNet: v-prediction-shaped output."""
    tt = t.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
    out = 0.1 * x * jnp.cos(tt / 100.0) - 0.05 * jnp.sign(x)
    if shift is not None:
        out = out + shift
    return out


def _manual_loop(scheduler, key, shape, condition):
    kx, kr = jax.random.split(key)
    x = jax.random.normal(kx, shape)
    k = kr
    for tk in scheduler.timesteps:
        k, ks = jax.random.split(k)
        tvec = jnp.full((shape[0],), int(tk), jnp.int32)
        out = _toy_denoiser(x, tvec, **condition)
        x = scheduler.step(out, tvec, x, key=ks)["prev_sample"]
    return x


@pytest.mark.parametrize("cls,kw", [
    (DDPMGFNPipeline, {}),
    (DDIMGFNPipeline, {"eta": 0.7}),
    (DDPMDPPipeline, {}),
])
def test_pipeline_matches_manual_loop(cls, kw):
    pipe = cls(_toy_denoiser, num_train_timesteps=50, **kw)
    key = jax.random.key(0)
    shift = jnp.full((2, 3, 4, 4), 0.2, jnp.float32)
    got = pipe(key, batch_size=2, num_inference_steps=10, x_shape=(3, 4, 4),
               condition={"shift": shift})
    want = _manual_loop(pipe.scheduler, key, (2, 3, 4, 4), {"shift": shift})
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    assert np.isfinite(np.asarray(got)).all()


def test_ddim_eta0_deterministic():
    pipe = DDIMGFNPipeline(_toy_denoiser, eta=0.0, num_train_timesteps=50)
    a = pipe(jax.random.key(1), batch_size=1, num_inference_steps=8, x_shape=(2, 4, 4))
    b = pipe(jax.random.key(1), batch_size=1, num_inference_steps=8, x_shape=(2, 4, 4))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ldm_pipeline_decodes():
    decode = lambda z: jnp.tanh(z) * 2.0
    pipe = LDMGFNPipeline(_toy_denoiser, decode, num_train_timesteps=50)
    out = pipe(jax.random.key(2), batch_size=2, num_inference_steps=6, x_shape=(2, 4, 4))
    assert out.shape == (2, 2, 4, 4)
    assert float(jnp.abs(out).max()) <= 2.0


def test_uniform_noise_and_scheduler_passthrough():
    sched = DDPMGFNScheduler(num_train_timesteps=40)
    pipe = DDPMGFNPipeline(_toy_denoiser, scheduler=sched)
    out = pipe(jax.random.key(3), batch_size=2, num_inference_steps=5,
               x_shape=(1, 4, 4), noise_type="uniform")
    assert out.shape == (2, 1, 4, 4)
    assert sched.num_inference_steps == 5
