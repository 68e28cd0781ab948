"""RTB stack: scheduler math, LoRA identity/grads, GFN sampler invariants, training smoke."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdgen_finetune_tpu.config import (
    DataConfig, MDGenConfig, ModelConfig, TaskConfig, TrainConfig, TransportConfig,
)
from mdgen_finetune_tpu.rtb.lora import lora_init, lora_merge
from mdgen_finetune_tpu.rtb.samplers import PosteriorPriorDGFN, rtb_loss
from mdgen_finetune_tpu.rtb.scheduler import DDPMGFNScheduler, betas_for_alpha_bar, normal_logprob
from mdgen_finetune_tpu.rtb.rewards import SurrogateReward


def test_beta_schedule_oracle():
    import math
    betas = betas_for_alpha_bar(100)
    # independent recomputation
    def ab(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    for i in [0, 10, 99]:
        expect = min(1 - ab((i + 1) / 100) / ab(i / 100), 0.999)
        np.testing.assert_allclose(betas[i], expect, rtol=1e-12)


def test_scheduler_step_oracle():
    sched = DDPMGFNScheduler(num_train_timesteps=50, prediction_type="v_prediction",
                             variance_type="fixed_large", clip_sample=True, clip_sample_range=3.0)
    sched.set_timesteps(10)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 4)), jnp.float32)
    t = 45
    out = sched.step(v, jnp.asarray(t), x, key=jax.random.key(0))
    # numpy oracle of DDPM formula 7 with v-pred
    a = np.cumprod(1 - np.asarray(betas_for_alpha_bar(50)))
    prev_t = t - 5
    ap, app = a[t], a[prev_t]
    bp, bpp = 1 - ap, 1 - app
    x0 = np.clip(ap**0.5 * np.asarray(x) - bp**0.5 * np.asarray(v), -3, 3)
    cur_a = ap / app
    mean = (app**0.5 * (1 - cur_a)) / bp * x0 + cur_a**0.5 * bpp / bp * np.asarray(x)
    np.testing.assert_allclose(np.asarray(out["posterior_mean"]), mean, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["posterior_std"]), (1 - cur_a) ** 0.5, atol=1e-6)
    # realized transition: prev = mean + std * noise
    np.testing.assert_allclose(
        np.asarray(out["prev_sample"]), mean + (1 - cur_a) ** 0.5 * np.asarray(out["noise"]), atol=1e-5
    )


def test_scheduler_add_noise_step_noise_consistency():
    sched = DDPMGFNScheduler(num_train_timesteps=50)
    sched.set_timesteps(10)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(3, 5)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(3, 5)), jnp.float32)
    t = jnp.asarray(40)
    t_prev = sched.previous_timestep(t)
    x_prev = sched.add_noise(x0, noise, t_prev[None])
    # step_noise moves prev(t) -> t along the same forward path
    x_t, mean, std = sched.step_noise(x_prev, noise, t)
    expect = sched.add_noise(x0, noise, t[None])
    np.testing.assert_allclose(np.asarray(x_t), np.asarray(expect), atol=1e-5)


def test_lora_identity_and_grads():
    key = jax.random.key(0)
    params = {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)}}
    lora = lora_init(key, params, rank=2, targets=lambda p: p.endswith("kernel"))
    merged = lora_merge(params, lora)
    np.testing.assert_allclose(np.asarray(merged["dense"]["kernel"]), np.ones((4, 4)))  # b=0 => identity

    def f(lora):
        m = lora_merge(params, lora)
        return jnp.sum(m["dense"]["kernel"] ** 2)

    g = jax.grad(f)(lora)
    assert np.abs(np.asarray(g["dense/kernel"]["b"])).sum() > 0  # grads reach the adapter


def _toy_sampler(dim=(3, 2), sampling_length=5):
    sched = DDPMGFNScheduler(num_train_timesteps=50)
    W = jnp.asarray(np.random.default_rng(2).normal(size=(int(np.prod(dim)), int(np.prod(dim)))) * 0.01, jnp.float32)

    def net(params, x, t, condition):
        flat = x.reshape(x.shape[0], -1)
        out = flat @ (W + params) * 0.1
        return out.reshape(x.shape)

    prior_fn = lambda x, t, c: net(0.0, x, t, c)
    posterior_fn = lambda lora, x, t, c: net(lora, x, t, c)
    return PosteriorPriorDGFN(
        scheduler=sched, prior_fn=prior_fn, posterior_fn=posterior_fn,
        dim=dim, sampling_length=sampling_length,
    )


def test_gfn_sampler_prior_equals_posterior_at_init():
    sampler = _toy_sampler()
    res = sampler.sample_fwd(jax.random.key(0), jnp.zeros(()), {}, batch_size=4)
    # posterior == prior (zero adapter) => identical forward log-probs
    np.testing.assert_allclose(
        np.asarray(res["logpf_posterior"]), np.asarray(res["logpf_prior"]), rtol=1e-5
    )
    assert np.isfinite(np.asarray(res["logpb"])).all()
    assert res["x"].shape == (4, 3, 2)


def test_gfn_sampler_grad_flows():
    sampler = _toy_sampler()

    def loss(delta):
        res = sampler.sample_fwd(jax.random.key(0), delta, {}, batch_size=2)
        return jnp.mean(rtb_loss(res["logpf_posterior"], 0.0, res["logpf_prior"], jnp.ones(2) * 5))

    g = jax.grad(loss)(jnp.zeros(()))
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_surrogate_reward_prefers_ideal_geometry():
    from mdgen_finetune_tpu.data.synthetic import synthesize_trajectory

    ideal = synthesize_trajectory("AGHK", 4, seed=0).astype(np.float32)[None]
    noisy = ideal + np.random.default_rng(3).normal(0, 0.5, ideal.shape).astype(np.float32)
    reward = SurrogateReward()
    aat = np.array([0, 5, 6, 8])
    r_ideal = float(reward(ideal, aat)[0])
    r_noisy = float(reward(noisy, aat)[0])
    assert r_ideal > r_noisy


def test_sample_back_and_forth():
    from mdgen_finetune_tpu.rtb.samplers import back_and_forth_loss

    sampler = _toy_sampler()
    res0 = sampler.sample_fwd(jax.random.key(0), jnp.zeros(()), {}, batch_size=3)
    res = sampler.sample_back_and_forth(jax.random.key(1), jnp.zeros(()), {}, res0["x"], noise_level=0.5)
    assert res["x_prime"].shape == res0["x"].shape
    for k in ["logpf_posterior_b", "logpf_prior_b", "logpf_posterior_f", "logpf_prior_f", "logpb_b"]:
        assert np.isfinite(np.asarray(res[k])).all(), k
    # zero adapter: posterior == prior on both segments
    np.testing.assert_allclose(
        np.asarray(res["logpf_posterior_f"]), np.asarray(res["logpf_prior_f"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(res["logpf_posterior_b"]), np.asarray(res["logpf_prior_b"]), rtol=1e-5
    )
    # the local loss is differentiable through the adapter
    def loss(delta):
        r = sampler.sample_back_and_forth(jax.random.key(1), delta, {}, res0["x"], noise_level=0.5)
        return jnp.mean(back_and_forth_loss(r, jnp.ones(3), jnp.zeros(3)))

    g = jax.grad(loss)(jnp.zeros(()))
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_sample_bkw_prior_logpf_and_grads():
    """Replay-path trajectory sampler: prior pf present, posterior == prior at
    zero adapter, gradient reaches the adapter through the posterior pf."""
    sampler = _toy_sampler()
    x = jax.random.normal(jax.random.key(3), (4, 3, 2))
    res = sampler.sample_bkw(jax.random.key(4), jnp.zeros(()), {}, x)
    assert set(res) >= {"x", "xT", "logpb", "logpf_posterior", "logpf_prior"}
    np.testing.assert_allclose(
        np.asarray(res["logpf_posterior"]), np.asarray(res["logpf_prior"]), rtol=1e-5
    )

    def loss(delta):
        r = sampler.sample_bkw(jax.random.key(4), delta, {}, x)
        return jnp.mean(rtb_loss(r["logpf_posterior"], 0.0, r["logpf_prior"], jnp.ones(4)))

    g = jax.grad(loss)(jnp.zeros(()))
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_langevin_correction_shifts_samples():
    """With log r(x) = -||x||^2 the correction -2*scale*x contracts samples
    toward the origin relative to the uncorrected sampler."""
    import dataclasses as _dc

    base = _toy_sampler(sampling_length=8)
    lgv = _dc.replace(base, langevin_fn=lambda x, t: jax.lax.stop_gradient(
        0.5 * jax.grad(lambda y: -jnp.sum(y**2))(x)))
    r0 = base.sample_fwd(jax.random.key(5), jnp.zeros(()), {}, batch_size=64)
    r1 = lgv.sample_fwd(jax.random.key(5), jnp.zeros(()), {}, batch_size=64)
    n0 = float(jnp.mean(jnp.sum(r0["x"] ** 2, axis=(1, 2))))
    n1 = float(jnp.mean(jnp.sum(r1["x"] ** 2, axis=(1, 2))))
    assert n1 < n0, (n1, n0)


def test_baseline_sampler_guidance_improves_reward():
    """DPS/FPS baseline (src/models/samplers.py:1016-1175): guidance moves
    samples toward higher reward without any training."""
    from mdgen_finetune_tpu.rtb.samplers import PosteriorPriorBaselineSampler

    dim = (3, 2)
    target = jnp.full((1, *dim), 1.5)
    log_r = lambda x0: -jnp.sum((x0 - target) ** 2, axis=(1, 2))

    def make(mc):
        return PosteriorPriorBaselineSampler(
            scheduler=DDPMGFNScheduler(num_train_timesteps=50),
            prior_fn=lambda x, t, c: 0.01 * x,
            dim=dim, sampling_length=8, scale=1.0, mc=mc, particles=4,
        )

    for mc in [False, True]:
        s = make(mc)
        unguided = s.sample(jax.random.key(6), {}, 32, log_reward_fn=log_r, sample_from_prior=True)
        guided = s.sample(jax.random.key(6), {}, 32, log_reward_fn=log_r)
        r_un = float(jnp.mean(log_r(unguided["x"])))
        r_gd = float(jnp.mean(log_r(guided["x"])))
        assert r_gd > r_un, (mc, r_gd, r_un)
        assert np.isfinite(np.asarray(guided["logpf_posterior"])).all()


def test_replay_buffer_strategies():
    from mdgen_finetune_tpu.rtb.replay_buffer import ReplayBuffer

    rng = np.random.default_rng(0)
    xs = rng.normal(size=(40, 3)).astype(np.float32)
    lrs = np.linspace(-10, 10, 40).astype(np.float32)
    uni = ReplayBuffer(100, mode="uniform", seed=0)
    uni.add(xs, lrs, np.zeros(40))
    x, lr = uni.sample(8)
    assert x.shape == (8, 3) and lr.shape == (8,)

    rew = ReplayBuffer(100, mode="reward", beta=2.0, seed=0)
    rew.add(xs, lrs, np.zeros(40))
    draws = np.concatenate([rew.sample(8)[1] for _ in range(50)])
    # reward-weighted mix must skew the draw distribution upward vs uniform
    assert draws.mean() > lrs.mean() + 1.0


def test_sde_sampler_with_tweedie():
    from mdgen_finetune_tpu.config import MDGenConfig, TaskConfig
    from mdgen_finetune_tpu.transport import create_transport

    tr = create_transport(MDGenConfig(task=TaskConfig(sim_condition=True)))
    model_fn = lambda x, t, **kw: -0.1 * x  # mild contraction velocity field
    for last in ["Mean", "Euler", "Tweedie"]:
        fn = tr.make_sde_sampler(model_fn, num_steps=8, last_step=last)
        out = fn(jax.random.key(0), jnp.ones((2, 4)))
        assert np.isfinite(np.asarray(out)).all(), last


def test_extra_schedulers_step():
    from mdgen_finetune_tpu.rtb.schedulers_extra import (
        DDIMGFNScheduler, EDMEulerGFNScheduler, SDEVEGFNScheduler,
    )

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 4)), jnp.float32)
    out_model = jnp.asarray(rng.normal(size=(2, 4)), jnp.float32)

    ddim = DDIMGFNScheduler(num_train_timesteps=20, eta=1.0)
    ddim.set_timesteps(5)
    o = ddim.step(out_model, jnp.asarray(16), x, key=jax.random.key(0))
    assert np.isfinite(np.asarray(o["prev_sample"])).all()
    # eta=1 recovers a stochastic transition consistent with its own mean/std
    np.testing.assert_allclose(
        np.asarray(o["prev_sample"]),
        np.asarray(o["posterior_mean"] + o["posterior_std"] * o["noise"]), atol=1e-5,
    )

    sve = SDEVEGFNScheduler(num_train_timesteps=20)
    o = sve.step(out_model, jnp.asarray(10), x, key=jax.random.key(1))
    assert np.isfinite(np.asarray(o["prev_sample"])).all()

    edm = EDMEulerGFNScheduler(num_inference_steps=10)
    o = edm.step(out_model, jnp.asarray(5), x, key=jax.random.key(2))
    assert np.isfinite(np.asarray(o["prev_sample"])).all()


def test_rtb_plots(tmp_path):
    from mdgen_finetune_tpu.rtb.plots import js_divergence, plot_energy_distributions, rel_distance_histograms
    from mdgen_finetune_tpu.data.synthetic import synthesize_trajectory

    rng = np.random.default_rng(7)
    a, b = rng.normal(0, 1, 500), rng.normal(2, 1, 500)
    assert js_divergence(a, a) < 1e-3 < js_divergence(a, b)
    p = str(tmp_path / "e.png")
    jsd = plot_energy_distributions(a, b, p)
    assert jsd > 0 and __import__("os").path.exists(p)
    t = synthesize_trajectory("AGHK", 20, seed=0).astype(np.float32)
    rel_distance_histograms(t[:10], t[10:], str(tmp_path / "d.png"))


def test_ddpm_dp_scheduler_oracle():
    from mdgen_finetune_tpu.rtb.schedulers_extra import DDPMDPScheduler, rescale_zero_terminal_snr

    T = 50
    sched = DDPMDPScheduler(num_train_timesteps=T, clip_sample=False)
    # linear schedule carries the 1000/T rescale (scheduling_ddpm_dp.py:205-208)
    scale = 1000.0 / T
    np.testing.assert_allclose(float(sched.betas[0]), scale * 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched.betas[-1]), scale * 0.02, rtol=1e-6)

    # no T-1 previous-timestep quirk (unlike the GFN scheduler)
    sched.set_timesteps(10)
    assert int(sched.previous_timestep(jnp.asarray(T - 1))) == T - 1 - 5

    # step: posterior-mean oracle (DDPM eq. 7, epsilon parametrization)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 4)), jnp.float32)
    eps = jnp.asarray(rng.normal(size=(2, 4)), jnp.float32)
    t = 45
    out = sched.step(eps, jnp.asarray(t), x, key=jax.random.key(0))
    a = np.cumprod(1 - np.asarray(sched.betas))
    ap, app = a[t], a[t - 5]
    x0 = (np.asarray(x) - (1 - ap) ** 0.5 * np.asarray(eps)) / ap**0.5
    cur_a = ap / app
    mean = (app**0.5 * (1 - cur_a)) / (1 - ap) * x0 + cur_a**0.5 * (1 - app) / (1 - ap) * np.asarray(x)
    np.testing.assert_allclose(np.asarray(out["posterior_mean"]), mean, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["pred_original_sample"]), x0, rtol=2e-4, atol=2e-5)
    # fixed_small variance
    var = (1 - app) / (1 - ap) * (1 - cur_a)
    np.testing.assert_allclose(float(out["posterior_std"]) ** 2, var, rtol=2e-4)
    # differentiable-posterior reparam identity and deterministic final step
    np.testing.assert_allclose(
        np.asarray(out["prev_sample"]),
        np.asarray(out["posterior_mean"] + out["posterior_std"] * out["noise"]), atol=1e-5,
    )
    out0 = sched.step(eps, jnp.asarray(0), x, key=jax.random.key(1))
    np.testing.assert_allclose(np.asarray(out0["prev_sample"]), np.asarray(out0["posterior_mean"]), atol=1e-6)

    # trailing spacing (scheduling_ddpm_dp.py:319-324)
    tr = DDPMDPScheduler(num_train_timesteps=10, timestep_spacing="trailing")
    ts = tr.set_timesteps(5)
    np.testing.assert_array_equal(ts, np.array([9, 7, 5, 3, 1]))

    # zero-terminal-SNR rescale drives alpha_bar[-1] to 0 (arXiv:2305.08891)
    betas = np.linspace(1e-4, 0.02, 100)
    rb = rescale_zero_terminal_snr(betas)
    assert abs(np.cumprod(1 - rb)[-1]) < 1e-10

    # dynamic thresholding maps x0 into [-1, 1] scaled by its own percentile
    th = DDPMDPScheduler(num_train_timesteps=T, thresholding=True, prediction_type="sample")
    big = jnp.asarray(rng.normal(size=(2, 16)) * 10, jnp.float32)
    x0t = th.pred_x0(big, jnp.asarray(10), jnp.zeros((2, 16)))
    assert float(jnp.max(jnp.abs(x0t))) <= 1.0 + 1e-6
