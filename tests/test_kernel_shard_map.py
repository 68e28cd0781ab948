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


def test_seq_shard_axes_rules():
    from mdgen_finetune_tpu.parallel.kernel_sharding import seq_shard_axes

    mesh = make_mesh(4, 2)
    # B=1: the whole mesh shards the sequence axis
    assert seq_shard_axes(mesh, 1, 16) == ((), ("dp", "sp"))
    # B=4: dp shards batch, sp shards the sequence
    assert seq_shard_axes(mesh, 4, 16) == (("dp",), ("sp",))
    # sequence not divisible by any remaining axis -> None
    assert seq_shard_axes(mesh, 1, 7) is None
    # B=2 divides neither axis prefix: batch replicated, seq over full mesh
    assert seq_shard_axes(mesh, 2, 16) == ((), ("dp", "sp"))


def _block_args(rng, B, T, L, C):
    r = lambda *s, sc=0.2: jnp.asarray(rng.normal(size=s), jnp.float32) * sc
    x = r(B, T * L, C, sc=0.5)
    sh, sc_, g = r(B, C), r(B, C), r(B, C, sc=0.5)
    wqkv, bqkv = r(C, 3 * C, sc=0.1), r(3 * C, sc=0.05)
    wout, bout = r(C, C, sc=0.1), r(C, sc=0.05)
    bk, bv = r(1, 1, C, sc=0.1), r(1, 1, C, sc=0.1)
    return x, sh, sc_, g, wqkv, bqkv, wout, bout, bk, bv


def test_rows_kernel_frame_sharded_B1():
    """batch < mesh (the ATLAS B=1 case, VERDICT r3 weak #4): the rows
    kernel runs FRAME-sharded over the whole mesh — forward + grads match
    the single-device XLA composition, and the sharded path itself engages
    (the helper returns non-None)."""
    from mdgen_finetune_tpu.ops.time_attention import (
        _res_rows_xla, _rows_frame_sharded, residue_rows_block)

    rng = np.random.default_rng(31)
    B, T, L, C, H = 1, 16, 12, 32, 4
    x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv = _block_args(rng, B, T, L, C)
    mask = jnp.asarray(rng.integers(0, 2, size=(B, T, L)), jnp.float32)
    mask = mask.at[:, :, 0].set(1.0)
    args = (x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, mask)

    ref = _res_rows_xla(*args, H, T, L)
    mesh = make_mesh(4, 2)
    with kernel_mesh(mesh):
        direct = _rows_frame_sharded(args, H, T, L, True)
        assert direct is not None, "frame-sharded path did not engage"
        got = residue_rows_block(*args, num_heads=H, tl=(T, L),
                                 force_pallas=True)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(ref),
                               atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-3)

    def loss_sharded(x, wqkv, g):
        with kernel_mesh(mesh):
            return jnp.sum(residue_rows_block(
                x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, mask,
                num_heads=H, tl=(T, L), force_pallas=True) ** 2)

    gs = jax.grad(loss_sharded, argnums=(0, 1, 2))(x, wqkv, g)
    gr = jax.grad(lambda x, w, g: jnp.sum(_res_rows_xla(
        x, sh, sc, g, w, bqkv, wout, bout, bk, bv, mask, H, T, L) ** 2),
        argnums=(0, 1, 2))(x, wqkv, g)
    for a, b in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-3)


def test_blocked_block_residue_sharded_B1():
    """batch < mesh: the blocked frame-attention kernel runs RESIDUE-sharded
    (full frame axis per device, no gathered keys) — forward + grads match
    the XLA composition and the sharded path engages."""
    import os

    from mdgen_finetune_tpu.ops.time_attention import (
        _block_xla, _time_residue_sharded, time_attention_block)

    rng = np.random.default_rng(37)
    B, T, L, C, H = 1, 24, 16, 32, 4  # L > MAX_L: the blocked branch
    x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv = _block_args(rng, B, T, L, C)
    kv = jnp.asarray(rng.integers(0, 2, size=(B, L, T)), jnp.float32).at[:, :, 0].set(1.0)
    args = (x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, kv)

    ref = _block_xla(*args, H, T, L)
    mesh = make_mesh(4, 2)
    os.environ["MDGEN_TIME_BLOCK"] = "blocked"
    try:
        with kernel_mesh(mesh):
            direct = _time_residue_sharded(args, H, T, L, True, None, blocked=True)
            assert direct is not None, "residue-sharded path did not engage"
            got = time_attention_block(*args, num_heads=H, tl=(T, L))
            gx, gw = jax.grad(
                lambda x_, w_: jnp.sum(time_attention_block(
                    x_, sh, sc, g, w_, bqkv, wout, bout, bk, bv, kv,
                    num_heads=H, tl=(T, L)) ** 2),
                argnums=(0, 1))(x, wqkv)
    finally:
        del os.environ["MDGEN_TIME_BLOCK"]
    np.testing.assert_allclose(np.asarray(direct), np.asarray(ref), atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-3)
    rx, rw = jax.grad(
        lambda x_, w_: jnp.sum(_block_xla(
            x_, sh, sc, g, w_, bqkv, wout, bout, bk, bv, kv, H, T, L) ** 2),
        argnums=(0, 1))(x, wqkv)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=5e-5, rtol=1e-3)


def test_layer_kernels_seq_sharded_B1_atlas_shaped():
    """B=1 ATLAS-shaped (large-L) modular layer with every stage's kernel
    forced on under the mesh: frames shard the residue stage, residues the
    frame stage, rows the MLP — 1e-4 parity vs the single-device XLA layer
    (VERDICT r3 item 4's done-bar, CPU-mesh scale)."""
    import os

    from mdgen_finetune_tpu.ops.fused_layer import _layer_kernels, _layer_xla

    rng = np.random.default_rng(41)
    B, T, L, C, H = 1, 16, 16, 32, 4
    N = T * L
    r = lambda *s, sc=0.2: jnp.asarray(rng.normal(size=s), jnp.float32) * sc
    x = r(B, N, C, sc=0.5)
    mod = r(B, 9 * C)
    ws = [r(C, 3 * C, sc=0.1), r(3 * C, sc=0.05), r(C, C, sc=0.1), r(C, sc=0.05),
          r(C, 3 * C, sc=0.1), r(3 * C, sc=0.05), r(C, C, sc=0.1), r(C, sc=0.05),
          r(C, 4 * C, sc=0.1), r(4 * C, sc=0.05), r(4 * C, C, sc=0.1), r(C, sc=0.05),
          r(1, 1, C, sc=0.1), r(1, 1, C, sc=0.1), r(1, 1, C, sc=0.1), r(1, 1, C, sc=0.1)]
    mask = jnp.asarray(rng.integers(0, 2, size=(B, T, L)), jnp.float32)
    mask = mask.at[:, :, 0].set(1.0).at[:, 0, :].set(1.0)

    ref = _layer_xla(x, mod, *ws, mask, H, T, L)
    mesh = make_mesh(4, 2)
    os.environ["MDGEN_RES_ROWS"] = "rows"
    os.environ["MDGEN_TIME_BLOCK"] = "blocked"
    os.environ["MDGEN_ADALN_MLP"] = "pallas"
    try:
        with kernel_mesh(mesh):
            got = _layer_kernels(x, mod, *ws, mask, H, T, L)
    finally:
        for k in ("MDGEN_RES_ROWS", "MDGEN_TIME_BLOCK", "MDGEN_ADALN_MLP"):
            del os.environ[k]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-3)
