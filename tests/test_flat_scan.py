"""Flat-latent sampling fast path (models/denoiser.make_scan_consts +
scan_consts= __call__): per-step-constant embed terms precomputed once, the
ODE carry kept in the padded trunk layout (B, Tp, L*P) across the scan.

Pins: (1) single-call velocity parity with the plain __call__ on the valid
region, (2) pad lanes exactly zero, (3) a multi-step euler chain in flat
layout matches the plain-path chain (pad-row drift never leaks into valid
rows), (4) flat_scan_ok gating.
"""
import jax
import jax.numpy as jnp
import numpy as np

from mdgen_finetune_tpu.config import DataConfig, MDGenConfig, ModelConfig, TaskConfig
from mdgen_finetune_tpu.geometry.rigid import Rigid
from mdgen_finetune_tpu.models import LatentMDGen
from mdgen_finetune_tpu.models.denoiser import flat_to_latent, latent_to_flat


def _mk():
    cfg = MDGenConfig(
        model=ModelConfig(num_layers=2, embed_dim=128, mha_heads=8,
                          prepend_ipa=True, abs_pos_emb=True),
        data=DataConfig(num_frames=6, crop=4),
        task=TaskConfig(sim_condition=True),
    )
    return LatentMDGen(cfg, cfg.latent_dim), cfg


def _inputs(cfg, seed=0):
    rng = np.random.default_rng(seed)
    B, T, L = 2, cfg.data.num_frames, cfg.data.crop
    x = jnp.asarray(rng.normal(size=(B, T, L, cfg.latent_dim)), jnp.float32)
    t = jnp.asarray(rng.uniform(0.2, 0.8, size=(B,)), jnp.float32)
    mask = jnp.ones((B, T, L), jnp.float32)
    frames = Rigid.identity((B, L))
    aatype = jnp.asarray(rng.integers(0, 20, size=(B, L)), jnp.int32)
    x_cond = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    x_cond_mask = jnp.asarray(rng.integers(0, 2, size=(B, T, L)), jnp.int32)
    return dict(x=x, t=t, mask=mask, start_frames=frames, end_frames=frames,
                x_cond=x_cond, x_cond_mask=x_cond_mask, aatype=aatype)


def test_flat_call_matches_plain():
    model, cfg = _mk()
    assert LatentMDGen.flat_scan_ok(cfg)
    kw = _inputs(cfg)
    B, T, L = kw["mask"].shape
    lat = cfg.latent_dim
    P = -(-lat // 128) * 128
    params = jax.jit(model.init)(jax.random.key(0), **kw)

    v_ref = jax.jit(model.apply)(params, **kw)

    consts = model.apply(params, kw["x_cond"], kw["x_cond_mask"], kw["mask"],
                         method=model.make_scan_consts)
    pack = model.apply(params, method=model.make_trunk_pack)
    xf = latent_to_flat(kw["x"], P)
    vf = jax.jit(lambda p, xf: model.apply(
        p, xf, kw["t"], kw["mask"], start_frames=kw["start_frames"],
        end_frames=kw["end_frames"], aatype=kw["aatype"],
        trunk_pack=pack, scan_consts=consts))(params, xf)

    assert vf.shape == (B, 8, L * P) and vf.dtype == jnp.float32
    # pad lanes are exactly zero (zero wfin columns)
    blocks = np.asarray(vf).reshape(B, 8, L, P)
    np.testing.assert_array_equal(blocks[..., lat:], 0.0)

    v_flat = flat_to_latent(vf, T, L, lat)
    np.testing.assert_allclose(np.asarray(v_flat), np.asarray(v_ref),
                               atol=2e-5, rtol=1e-4)


def test_flat_euler_chain_matches_plain():
    """3 euler steps carried in flat layout == 3 plain-path steps: the
    garbage in pad rows never reaches valid rows."""
    model, cfg = _mk()
    kw = _inputs(cfg, seed=1)
    B, T, L = kw["mask"].shape
    lat = cfg.latent_dim
    P = -(-lat // 128) * 128
    params = jax.jit(model.init)(jax.random.key(0), **kw)
    consts = model.apply(params, kw["x_cond"], kw["x_cond_mask"], kw["mask"],
                         method=model.make_scan_consts)
    pack = model.apply(params, method=model.make_trunk_pack)
    ts = [0.1, 0.4, 0.7]
    dt = 0.3

    x_plain = kw["x"]
    for tv in ts:
        v = model.apply(params, x_plain, jnp.full((B,), tv), kw["mask"],
                        start_frames=kw["start_frames"], end_frames=kw["end_frames"],
                        x_cond=kw["x_cond"], x_cond_mask=kw["x_cond_mask"],
                        aatype=kw["aatype"], trunk_pack=pack)
        x_plain = x_plain + dt * v

    xf = latent_to_flat(kw["x"], P)
    for tv in ts:
        vf = model.apply(params, xf, jnp.full((B,), tv), kw["mask"],
                         start_frames=kw["start_frames"], end_frames=kw["end_frames"],
                         aatype=kw["aatype"], trunk_pack=pack, scan_consts=consts)
        xf = xf + dt * vf
    np.testing.assert_allclose(np.asarray(flat_to_latent(xf, T, L, lat)),
                               np.asarray(x_plain), atol=5e-5, rtol=1e-4)


def test_flat_euler_chain_with_kernel_fold():
    """ode_dt folds the euler update (and the embed) into the trunk op:
    chain of folded steps == plain-path chain. Runs both the XLA per-layer
    fold and the interpret-mode mega-kernel fold (MDGEN_FUSED_LAYER=pallas)."""
    import os

    model, cfg = _mk()
    kw = _inputs(cfg, seed=2)
    B, T, L = kw["mask"].shape
    lat = cfg.latent_dim
    P = -(-lat // 128) * 128
    params = jax.jit(model.init)(jax.random.key(0), **kw)
    consts = model.apply(params, kw["x_cond"], kw["x_cond_mask"], kw["mask"],
                         method=model.make_scan_consts)
    pack = model.apply(params, method=model.make_trunk_pack)
    ts = [0.2, 0.5]
    dt = 0.25

    x_plain = kw["x"]
    for tv in ts:
        v = model.apply(params, x_plain, jnp.full((B,), tv), kw["mask"],
                        start_frames=kw["start_frames"], end_frames=kw["end_frames"],
                        x_cond=kw["x_cond"], x_cond_mask=kw["x_cond_mask"],
                        aatype=kw["aatype"], trunk_pack=pack)
        x_plain = x_plain + dt * v

    def folded_chain():
        xf = latent_to_flat(kw["x"], P)
        for tv in ts:
            xf = model.apply(params, xf, jnp.full((B,), tv), kw["mask"],
                             start_frames=kw["start_frames"],
                             end_frames=kw["end_frames"], aatype=kw["aatype"],
                             trunk_pack=pack, scan_consts=consts, ode_dt=dt)
        return flat_to_latent(xf, T, L, lat)

    np.testing.assert_allclose(np.asarray(folded_chain()), np.asarray(x_plain),
                               atol=5e-5, rtol=1e-4)

    os.environ["MDGEN_FUSED_LAYER"] = "pallas"  # interpret-mode mega-kernel
    try:
        got = folded_chain()
    finally:
        del os.environ["MDGEN_FUSED_LAYER"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(x_plain),
                               atol=5e-5, rtol=1e-4)


def test_multi_step_fold_matches_single_steps():
    """flat_euler_steps (S steps in ONE fused-trunk call, the inter-step
    carry in VMEM) == S successive single-step folded calls, exactly on the
    valid region — both on the XLA per-layer fallback and the interpret-mode
    mega-kernel (MDGEN_FUSED_LAYER=pallas)."""
    import os

    model, cfg = _mk()
    kw = _inputs(cfg, seed=3)
    B, T, L = kw["mask"].shape
    lat = cfg.latent_dim
    P = -(-lat // 128) * 128
    params = jax.jit(model.init)(jax.random.key(0), **kw)
    consts = model.apply(params, kw["x_cond"], kw["x_cond_mask"], kw["mask"],
                         aatype=kw["aatype"], start_frames=kw["start_frames"],
                         end_frames=kw["end_frames"],
                         method=model.make_scan_consts)
    pack = model.apply(params, method=model.make_trunk_pack)
    ts = [0.15, 0.45, 0.75]
    dt = 0.3

    def single_chain():
        xf = latent_to_flat(kw["x"], P)
        for tv in ts:
            xf = model.apply(params, xf, jnp.full((B,), tv), kw["mask"],
                             start_frames=kw["start_frames"],
                             end_frames=kw["end_frames"], aatype=kw["aatype"],
                             trunk_pack=pack, scan_consts=consts, ode_dt=dt)
        return flat_to_latent(xf, T, L, lat)

    def multi_call():
        xf = latent_to_flat(kw["x"], P)
        tgrid = jnp.asarray(ts, jnp.float32)[:, None] * jnp.ones((1, B), jnp.float32)
        out = model.apply(params, xf, tgrid, kw["mask"], consts, pack,
                          start_frames=kw["start_frames"],
                          end_frames=kw["end_frames"], aatype=kw["aatype"],
                          ode_dt=dt, method=model.flat_euler_steps)
        return flat_to_latent(out, T, L, lat)

    ref = np.asarray(single_chain())
    np.testing.assert_allclose(np.asarray(multi_call()), ref, atol=2e-5, rtol=1e-4)

    os.environ["MDGEN_FUSED_LAYER"] = "pallas"  # interpret-mode mega-kernel
    try:
        got = np.asarray(multi_call())
        ref_k = np.asarray(single_chain())
    finally:
        del os.environ["MDGEN_FUSED_LAYER"]
    np.testing.assert_allclose(got, ref_k, atol=2e-5, rtol=1e-4)


def test_flat_scan_ok_gating():
    _, cfg = _mk()
    assert LatentMDGen.flat_scan_ok(cfg)
    import dataclasses
    bad = dataclasses.replace(cfg, task=TaskConfig(design=True))
    assert not LatentMDGen.flat_scan_ok(bad)
    bad2 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, hyena=True))
    assert not LatentMDGen.flat_scan_ok(bad2)


def test_encode_steps_matches_per_step_encoder():
    """encode_steps (chunk-batched whole-t-grid encoder precompute, the r4
    fast-path change) slice s == the per-step _flat_call encoder route: a
    flat call fed enc=encode_steps(ts)[s] must equal the same call computing
    its encoder in-step."""
    model, cfg = _mk()
    kw = _inputs(cfg, seed=3)
    B, T, L = kw["mask"].shape
    lat = cfg.latent_dim
    P = -(-lat // 128) * 128
    params = jax.jit(model.init)(jax.random.key(0), **kw)
    consts = model.apply(params, kw["x_cond"], kw["x_cond_mask"], kw["mask"],
                         method=model.make_scan_consts)
    pack = model.apply(params, method=model.make_trunk_pack)
    ts = jnp.asarray([[0.15] * B, [0.6] * B], jnp.float32)  # (S=2, B)

    encs = model.apply(params, ts, kw["mask"], consts, pack,
                       start_frames=kw["start_frames"], end_frames=kw["end_frames"],
                       aatype=kw["aatype"], method=model.encode_steps)
    assert encs.shape == (2, B, L * cfg.model.embed_dim)

    xf = latent_to_flat(kw["x"], P)
    for s in range(2):
        v_in_step = model.apply(params, xf, ts[s], kw["mask"],
                                start_frames=kw["start_frames"],
                                end_frames=kw["end_frames"], aatype=kw["aatype"],
                                trunk_pack=pack, scan_consts=consts)
        v_pre = model.apply(params, xf, ts[s], kw["mask"],
                            start_frames=kw["start_frames"],
                            end_frames=kw["end_frames"], aatype=kw["aatype"],
                            trunk_pack=pack, scan_consts=consts, enc=encs[s])
        np.testing.assert_allclose(np.asarray(v_pre), np.asarray(v_in_step),
                                   atol=2e-5, rtol=1e-4)
