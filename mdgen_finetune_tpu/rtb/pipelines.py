"""Diffusion sampling pipelines over the GFN scheduler family.

TPU-native counterpart of the reference's vendored HF pipelines
(src/rtb_utils/diffusers/pipelines/: ddpm_gfn/pipeline_ddpm.py:26-150,
ddim_gfn/pipeline_ddim_gfn.py, ddpm_dp/pipeline_ddpm_dp.py,
ldm_gfn/pipeline_ldm_gfn.py — ~600 LoC of torch host loops). Here a pipeline
binds a denoise function to a scheduler and runs the WHOLE ancestral chain
inside one jitted ``lax.scan`` — no per-step host dispatch, static shapes,
one compilation per (shape, step-count). The per-step math lives entirely in
the schedulers (rtb/scheduler.py, rtb/schedulers_extra.py), so every
pipeline is a thin loop — exactly like the reference, where the pipelines
call ``scheduler.step`` in a python loop.

The RTB fine-tuning path does not use these (PosteriorPriorDGFN runs its own
instrumented chain that records log-probs); they are the plain-generation
surface for a trained denoiser.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .scheduler import DDPMGFNScheduler
from .schedulers_extra import DDIMGFNScheduler, DDPMDPScheduler


class DiffusionPipeline:
    """Generic ancestral-sampling pipeline.

    ``denoise_fn(x, t, **condition) -> model_output`` where ``t`` is a (B,)
    int32 vector of train-timestep indices; ``scheduler`` is any GFN
    scheduler exposing ``set_timesteps``/``step``. ``decode_fn`` (optional)
    maps final latents to the output space (the LDM pipeline's VAE decode).
    """

    def __init__(self, denoise_fn: Callable, scheduler,
                 decode_fn: Optional[Callable] = None):
        self.denoise_fn = denoise_fn
        self.scheduler = scheduler
        self.decode_fn = decode_fn

        def _run(key, x0_noise, ts, condition):
            def body(carry, tk):
                x, k = carry
                k, ks = jax.random.split(k)
                tvec = jnp.full((x.shape[0],), tk, jnp.int32)
                out = self.denoise_fn(x, tvec, **condition)
                res = self.scheduler.step(out, tvec, x, key=ks)
                return (res["prev_sample"], k), ()

            (x, _), _ = jax.lax.scan(body, (x0_noise, key), ts)
            return x

        self._run_jit = jax.jit(_run)

    # ------------------------------------------------------------------
    def __call__(self, key, batch_size: int = 1,
                 num_inference_steps: Optional[int] = None,
                 x_shape: Optional[tuple] = None,
                 condition: Optional[dict] = None,
                 noise_type: str = "gaussian"):
        """Sample ``(batch_size, *x_shape)``. Matches the reference
        pipeline contract (pipeline_ddpm.py:50-147): gaussian or
        uniform(-3, 3) initial noise, ``condition`` forwarded to the
        denoiser each step."""
        assert x_shape is not None, "x_shape is required (no HF model config here)"
        if num_inference_steps is not None:
            self.scheduler.set_timesteps(num_inference_steps)
        shape = (batch_size,) + tuple(x_shape)
        kx, kr = jax.random.split(key)
        if noise_type == "uniform":
            x = 6.0 * jax.random.uniform(kx, shape) - 3.0
        else:
            x = jax.random.normal(kx, shape)
        ts = jnp.asarray(self.scheduler.timesteps, jnp.int32)
        x = self._run_jit(kr, x, ts, condition or {})
        if self.decode_fn is not None:
            x = self.decode_fn(x)
        return x

    def sample(self, *args, **kwargs):
        return self(*args, **kwargs)


class DDPMGFNPipeline(DiffusionPipeline):
    """DDPM ancestral sampling (reference pipeline_ddpm.py:26-150). Coerces
    any scheduler config to the DDPM-GFN step, like the reference's
    ``DDPMGFNScheduler.from_config`` guard."""

    def __init__(self, denoise_fn, scheduler=None, **sched_kw):
        if scheduler is None:
            scheduler = DDPMGFNScheduler(**sched_kw)
        elif not isinstance(scheduler, DDPMGFNScheduler):
            raise TypeError("DDPMGFNPipeline needs a DDPMGFNScheduler(-family) scheduler")
        super().__init__(denoise_fn, scheduler)


class DDIMGFNPipeline(DiffusionPipeline):
    """DDIM sampling with eta-controlled stochasticity (reference
    pipeline_ddim_gfn.py; eta lives on the scheduler)."""

    def __init__(self, denoise_fn, scheduler=None, eta: float = 0.0, **sched_kw):
        if scheduler is None:
            scheduler = DDIMGFNScheduler(eta=eta, **sched_kw)
        super().__init__(denoise_fn, scheduler)


class DDPMDPPipeline(DiffusionPipeline):
    """DDPM-DP sampling (zero-terminal-SNR betas, trailing spacing, dynamic
    thresholding — reference pipeline_ddpm_dp.py over scheduling_ddpm_dp)."""

    def __init__(self, denoise_fn, scheduler=None, **sched_kw):
        if scheduler is None:
            scheduler = DDPMDPScheduler(**sched_kw)
        super().__init__(denoise_fn, scheduler)


class LDMGFNPipeline(DiffusionPipeline):
    """Latent-space sampling + decode (reference pipeline_ldm_gfn.py:60-137:
    scheduler loop over latents, then autoencoder.decode). ``decode_fn`` is
    the decoder half of any autoencoder (e.g. a jitted flax apply)."""

    def __init__(self, denoise_fn, decode_fn, scheduler=None, eta: float = 1.0,
                 **sched_kw):
        if scheduler is None:
            scheduler = DDIMGFNScheduler(eta=eta, **sched_kw)
        super().__init__(denoise_fn, scheduler, decode_fn=decode_fn)
