"""Fused whole-layer kernel: interpret-mode parity vs the XLA composition
(which the golden model tests pin to the torch reference), plus grads."""
import numpy as np

import jax
import jax.numpy as jnp

from mdgen_finetune_tpu.ops.fused_layer import _layer_xla, _pallas_fwd, fused_layer


def _inputs(B=2, T=10, L=3, C=32, H=4, seed=0, masked=False):
    rng = np.random.default_rng(seed)
    N = T * L
    r = lambda *s, sc=0.1: jnp.asarray(rng.normal(size=s), jnp.float32) * sc
    x = r(B, N, C, sc=0.5)
    mod = r(B, 9 * C, sc=0.2)
    args = dict(
        wqkv_l=r(C, 3 * C), bqkv_l=r(3 * C), wout_l=r(C, C), bout_l=r(C),
        wqkv_t=r(C, 3 * C), bqkv_t=r(3 * C), wout_t=r(C, C), bout_t=r(C),
        w1=r(C, 4 * C), b1=r(4 * C), w2=r(4 * C, C), b2=r(C),
        bkl=r(1, 1, C), bvl=r(1, 1, C), bkt=r(1, 1, C), bvt=r(1, 1, C),
    )
    if masked:
        mask = jnp.asarray(rng.integers(0, 2, size=(B, T, L)), jnp.float32)
        mask = mask.at[:, :, 0].set(1.0).at[:, 0, :].set(1.0)
    else:
        mask = jnp.ones((B, T, L), jnp.float32)
    return x, mod, args, mask, (T, L), H


def test_fused_layer_matches_xla_composition():
    for T, L, masked in [(10, 3, False), (10, 3, True), (16, 4, False)]:
        x, mod, a, mask, tl, H = _inputs(T=T, L=L, masked=masked)
        ref = _layer_xla(x, mod, *a.values(), mask, H, *tl)
        got = _pallas_fwd(x, mod, *a.values(), mask, H, *tl, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-4), (T, L, masked)


def test_fused_layer_grads_flow():
    x, mod, a, mask, tl, H = _inputs()

    def loss(x, mod, wqkv_l, w1):
        aa = dict(a, wqkv_l=wqkv_l, w1=w1)
        out = fused_layer(x, mod, *aa.values(), mask, num_heads=H, tl=tl)
        return jnp.sum(out**2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, mod, a["wqkv_l"], a["w1"])
    for gr in grads:
        assert np.isfinite(np.asarray(gr)).all()
        assert float(jnp.abs(gr).max()) > 0


def test_fused_layer_padded_head_layout():
    """D = 24 (the flagship head_dim) routes stage 2 through the lane-padded
    Dp = 32 head layout; parity vs the XLA composition pins the padding,
    padded rope tables, and padded weight re-layouts."""
    x, mod, a, mask, tl, H = _inputs(B=1, T=9, L=2, C=384, H=16, masked=True, seed=5)
    ref = _layer_xla(x, mod, *a.values(), mask, H, *tl)
    got = _pallas_fwd(x, mod, *a.values(), mask, H, *tl, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-3)


def test_layer_kernels_swap_routing_matches_xla():
    """_layer_kernels at large L routes the residue stage through
    residue_rows_block (rank-4 rows kernel on TPU; the swap-axes
    time_attention_block path is its CPU/ineligible fallback). On CPU every
    core falls back to its XLA twin, so this pins the ROUTING (key_valid
    orientation, mods wiring, fallback transposes) against _layer_xla; the
    rows KERNEL itself is pinned interpret-mode in
    tests/test_time_attention.py::test_rows_kernel_matches_xla_reference."""
    from mdgen_finetune_tpu.ops.fused_layer import _layer_kernels, _layer_xla

    rng = np.random.default_rng(11)
    B, T, L, C, H = 2, 8, 16, 32, 4  # L > residue MAX_L -> swap route
    N = T * L
    r = lambda *s, sc=0.2: jnp.asarray(rng.normal(size=s), jnp.float32) * sc
    x = r(B, N, C, sc=0.5)
    mod = r(B, 9 * C)
    ws = [r(C, 3 * C), r(3 * C), r(C, C), r(C),
          r(C, 3 * C), r(3 * C), r(C, C), r(C),
          r(C, 4 * C), r(4 * C), r(4 * C, C), r(C),
          r(1, 1, C), r(1, 1, C), r(1, 1, C), r(1, 1, C)]
    mask = jnp.asarray(rng.integers(0, 2, size=(B, T, L)), jnp.float32)
    mask = mask.at[:, :, 0].set(1.0).at[:, 0, :].set(1.0)

    ref = _layer_xla(x, mod, *ws, mask, H, T, L)
    got = _layer_kernels(x, mod, *ws, mask, H, T, L)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)
