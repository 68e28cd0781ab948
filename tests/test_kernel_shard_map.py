"""Pallas kernels under multi-device meshes (VERDICT r2 weak #2).

Round 2 gated every kernel to ``jax.device_count() == 1``; round 3 replaces
the gates with jax.shard_map over the registered mesh — each device runs the
kernel on its LOCAL batch shard (parallel/kernel_sharding.py). These tests
run the kernel path in interpret mode on the 8-CPU-device mesh through the
real dispatchers and pin forward AND gradient parity against the
single-device XLA composition (which the golden model tests pin to the torch
reference).
"""
import numpy as np

import jax
import jax.numpy as jnp

from mdgen_finetune_tpu.ops.fused_layer import _layer_xla, fused_layer
from mdgen_finetune_tpu.ops.residue_attention import residue_attention
from mdgen_finetune_tpu.ops.residue_attention import _xla_impl as _res_xla
from mdgen_finetune_tpu.ops.time_attention import time_attention
from mdgen_finetune_tpu.ops.time_attention import _xla_impl as _time_xla
from mdgen_finetune_tpu.parallel.kernel_sharding import (
    batch_shard_axes,
    kernel_mesh,
)
from mdgen_finetune_tpu.parallel.mesh import make_mesh

from test_fused_layer import _inputs


def test_batch_shard_axes_rules():
    mesh = make_mesh(4, 2)
    assert batch_shard_axes(mesh, 8) == ("dp", "sp")
    assert batch_shard_axes(mesh, 16) == ("dp", "sp")
    assert batch_shard_axes(mesh, 4) == ("dp",)
    assert batch_shard_axes(mesh, 6) is None


def test_fused_layer_shard_map_matches_xla():
    mesh = make_mesh(4, 2)
    x, mod, a, mask, tl, H = _inputs(B=8, T=10, L=3, masked=True)
    ref = _layer_xla(x, mod, *a.values(), mask, H, *tl)
    with kernel_mesh(mesh):
        got = fused_layer(x, mod, *a.values(), mask, num_heads=H, tl=tl,
                          force_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-4)


def test_fused_layer_shard_map_grads_match_xla():
    # weight cotangents must be psum'd across the mesh by shard_map's
    # transpose; x cotangents stay batch-sharded
    mesh = make_mesh(4, 2)
    x, mod, a, mask, tl, H = _inputs(B=8, T=10, L=3)

    def loss_pallas(x, mod, wqkv_l, w1):
        aa = dict(a, wqkv_l=wqkv_l, w1=w1)
        with kernel_mesh(mesh):
            out = fused_layer(x, mod, *aa.values(), mask, num_heads=H, tl=tl,
                              force_pallas=True)
        return jnp.sum(out**2)

    def loss_xla(x, mod, wqkv_l, w1):
        aa = dict(a, wqkv_l=wqkv_l, w1=w1)
        return jnp.sum(_layer_xla(x, mod, *aa.values(), mask, H, *tl) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x, mod, a["wqkv_l"], a["w1"])
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(x, mod, a["wqkv_l"], a["w1"])
    for p, r in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r), atol=2e-3, rtol=1e-3)


def _qkv_inputs(B, T, L, C=32, seed=0):
    rng = np.random.default_rng(seed)
    r = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32) * 0.3
    return r(B, T, L, C), r(B, T, L, C), r(B, T, L, C), r(1, 1, C), r(1, 1, C)


def test_time_attention_shard_map_matches_xla():
    mesh = make_mesh(8, 1)
    B, T, L = 8, 10, 3
    q, k, v, bk, bv, = _qkv_inputs(B, T, L)
    rng = np.random.default_rng(1)
    key_valid = jnp.asarray(rng.integers(0, 2, size=(B, L, T)), jnp.float32).at[:, :, 0].set(1.0)
    ref = _time_xla(q, k, v, bk, bv, key_valid, 4)
    with kernel_mesh(mesh):
        got = time_attention(q, k, v, bk, bv, key_valid, num_heads=4, force_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-4)


def test_residue_attention_shard_map_matches_xla():
    mesh = make_mesh(4, 2)
    B, T, L = 8, 6, 4
    q, k, v, bk, bv = _qkv_inputs(B, T, L, seed=2)
    rng = np.random.default_rng(3)
    key_valid = jnp.asarray(rng.integers(0, 2, size=(B, T, L)), jnp.float32).at[:, :, 0].set(1.0)
    ref = _res_xla(q, k, v, bk, bv, key_valid, 4)
    with kernel_mesh(mesh):
        got = residue_attention(q, k, v, bk, bv, key_valid, num_heads=4, force_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-4)


def test_indivisible_batch_still_correct():
    # B=6 divides neither the 4x2 mesh nor its dp axis: the dispatcher falls
    # back off shard_map but must stay numerically correct
    mesh = make_mesh(4, 2)
    x, mod, a, mask, tl, H = _inputs(B=6, T=10, L=3)
    ref = _layer_xla(x, mod, *a.values(), mask, H, *tl)
    with kernel_mesh(mesh):
        got = fused_layer(x, mod, *a.values(), mask, num_heads=H, tl=tl,
                          force_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-4)


def test_fused_trunk_shard_map_matches_per_layer():
    """Streaming whole-trunk kernel under the dp x sp mesh: forward and
    weight/x gradients match the single-device per-layer XLA composition."""
    from mdgen_finetune_tpu.ops.fused_layer import (
        _pad_trunk, _unpad_trunk, fused_trunk)

    mesh = make_mesh(4, 2)
    NL = 2
    x, _, a0, mask, tl, H = _inputs(B=8, T=10, L=3, masked=True)
    T, L = tl
    C = x.shape[-1]
    _, _, a1, _, _, _ = _inputs(B=8, T=10, L=3, seed=1)
    rng = np.random.default_rng(3)
    mods = jnp.asarray(rng.normal(size=(8, NL * 9 * C)), jnp.float32) * 0.2
    ws = tuple(jnp.stack([a0[k], a1[k]]) for k in a0)

    def ref_fn(x, mods, *ws_flat):
        h = x
        for i in range(NL):
            h = _layer_xla(h, mods[:, i * 9 * C:(i + 1) * 9 * C],
                           *(w[i] for w in ws_flat), mask, H, T, L)
        return h

    def trunk_fn(x, mods, *ws_flat):
        with kernel_mesh(mesh):
            out = fused_trunk(_pad_trunk(x, T, L, C), mods, tuple(ws_flat),
                              mask, num_heads=H, tl=tl, force_pallas=True)
        return _unpad_trunk(out, T, L, C)

    ref = ref_fn(x, mods, *ws)
    got = trunk_fn(x, mods, *ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-4)

    gp = jax.grad(lambda *aa: jnp.sum(trunk_fn(*aa) ** 2), argnums=(0, 1, 2, 10))(x, mods, *ws)
    gx = jax.grad(lambda *aa: jnp.sum(ref_fn(*aa) ** 2), argnums=(0, 1, 2, 10))(x, mods, *ws)
    for p, r in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r), atol=2e-3, rtol=1e-3)


def test_ipa_encoder_shard_map_matches_twin():
    """Fused IPA-encoder kernel under the dp x sp mesh: forward and
    gradients match the single-device XLA twin (which the parent-vs-module
    bit-equality test pins to the IPALayer modules)."""
    from mdgen_finetune_tpu.geometry.rigid import Rigid
    from mdgen_finetune_tpu.ops.ipa_encoder import encoder_xla, ipa_encoder

    B, L, C, Hm, Hi, Ch, Pq, Pv, NL = 8, 4, 128, 8, 4, 32, 8, 8, 2
    HCh, HPq, HPv = Hi * Ch, Hi * Pq, Hi * Pv
    FEAT = HCh + 4 * HPv
    shapes = [(C,), (C,), (C, HCh), (HCh,), (C, HCh), (HCh,), (C, HCh), (HCh,),
              (C, 3 * HPq), (3 * HPq,), (C, 3 * HPq), (3 * HPq,),
              (C, 3 * HPv), (3 * HPv,), (Hi,), (FEAT, C), (C,),
              (C, 3 * C), (3 * C,), (C, C), (C,), (C,), (C,),
              (C, 4 * C), (4 * C,), (4 * C, C), (C,)]
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32) * 0.5
    mods = jnp.asarray(rng.normal(size=(B, NL * 6 * C)), jnp.float32) * 0.2

    def w(s, i):
        sc = 0.3 if len(s) == 1 else (s[0] ** -0.5)
        return jnp.asarray(rng.normal(size=s), jnp.float32) * sc + (1.0 if i == 0 else 0.0)

    ws = tuple(jnp.stack([w(s, i) for _ in range(NL)])
               for i, s in enumerate(shapes))
    frames = Rigid.identity((B, L))
    mask = jnp.ones((B, L), jnp.float32)
    mesh = make_mesh(4, 2)

    def run_mesh(x_, mods_, *flat):
        with kernel_mesh(mesh):
            return ipa_encoder(x_, mods_, tuple(flat), frames, mask,
                               num_heads_mha=Hm, Hi=Hi, Ch=Ch, Pq=Pq, Pv=Pv,
                               force_pallas=True)

    def run_twin(x_, mods_, *flat):
        lws = [tuple(wk[i] for wk in flat) for i in range(NL)]
        return encoder_xla(x_, mods_, lws, frames, mask, Hm, Hi, Ch, Pq, Pv,
                           x_.dtype)

    got = run_mesh(x, mods, *ws)
    ref = run_twin(x, mods, *ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)

    gm = jax.grad(lambda *a: jnp.sum(run_mesh(*a) ** 2), argnums=(0, 1, 4))(x, mods, *ws)
    gt = jax.grad(lambda *a: jnp.sum(run_twin(*a) ** 2), argnums=(0, 1, 4))(x, mods, *ws)
    for a, b in zip(gm, gt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=1e-3)


def test_blocked_block_shard_map_matches_xla():
    """The blocked whole-block kernel (large-L/long-T fused block, r3) under
    the dp x sp mesh: forward and gradients vs the XLA composition."""
    import os

    from mdgen_finetune_tpu.ops.time_attention import _block_xla, time_attention_block

    rng = np.random.default_rng(23)
    B, T, L, C, H = 8, 24, 12, 32, 4  # L > MAX_L: the blocked branch's home
    N = T * L
    r = lambda *s, sc=0.2: jnp.asarray(rng.normal(size=s), jnp.float32) * sc
    x = r(B, N, C, sc=0.5)
    sh, sc_, g = r(B, C), r(B, C), r(B, C, sc=0.5)
    wqkv, bqkv = r(C, 3 * C, sc=0.1), r(3 * C, sc=0.05)
    wout, bout = r(C, C, sc=0.1), r(C, sc=0.05)
    bk, bv = r(1, 1, C, sc=0.1), r(1, 1, C, sc=0.1)
    kv = jnp.asarray(rng.integers(0, 2, size=(B, L, T)), jnp.float32).at[:, :, 0].set(1.0)

    args = (x, sh, sc_, g, wqkv, bqkv, wout, bout, bk, bv, kv)
    ref = _block_xla(*args, H, T, L)
    mesh = make_mesh(4, 2)
    os.environ["MDGEN_TIME_BLOCK"] = "blocked"
    try:
        with kernel_mesh(mesh):
            got = time_attention_block(*args, num_heads=H, tl=(T, L))
            gx, gw = jax.grad(
                lambda x_, w_: jnp.sum(time_attention_block(
                    x_, sh, sc_, g, w_, bqkv, wout, bout, bk, bv, kv,
                    num_heads=H, tl=(T, L)) ** 2),
                argnums=(0, 1))(x, wqkv)
    finally:
        del os.environ["MDGEN_TIME_BLOCK"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-4)
    rx, rw = jax.grad(
        lambda x_, w_: jnp.sum(_block_xla(
            x_, sh, sc_, g, w_, bqkv, wout, bout, bk, bv, kv, H, T, L) ** 2),
        argnums=(0, 1))(x, wqkv)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=5e-5, rtol=1e-3)
