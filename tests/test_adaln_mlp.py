"""Fused AdaLN-MLP kernel: parity with the XLA composition (interpret mode)
and gradient plumbing; accuracy pin for the fast erf-GELU."""
import math

import numpy as np

import jax
import jax.numpy as jnp

from mdgen_finetune_tpu.ops.adaln_mlp import (
    _gelu_fast,
    _gelu_fast_with_grad,
    _pallas_fwd,
    _xla_impl,
    adaln_mlp,
)


def _inputs(B=2, N=40, C=64, F=256, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    sh = jnp.asarray(rng.normal(size=(B, C)), jnp.float32) * 0.3
    sc = jnp.asarray(rng.normal(size=(B, C)), jnp.float32) * 0.3
    g = jnp.asarray(rng.normal(size=(B, C)), jnp.float32) * 0.5
    w1 = jnp.asarray(rng.normal(size=(C, F)), jnp.float32) * 0.05
    b1 = jnp.asarray(rng.normal(size=(F,)), jnp.float32) * 0.05
    w2 = jnp.asarray(rng.normal(size=(F, C)), jnp.float32) * 0.05
    b2 = jnp.asarray(rng.normal(size=(C,)), jnp.float32) * 0.05
    return x, sh, sc, g, w1, b1, w2, b2


def test_kernel_matches_xla():
    for N in [40, 100]:  # divisor-block and padded-block paths
        args = _inputs(N=N)
        ref = _xla_impl(*args)
        got = _pallas_fwd(*args, interpret=True, block_rows=32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_gelu_fast_accuracy_pin():
    """The degree-4 algebraic-sigmoid erf fit (no exp/divide — 0.079
    ms/layer of the whole-layer kernel was the A&S erf chain, PERF.md r3) is
    pinned at 1e-4 max abs error vs exact erf-GELU (~100x below bf16
    activation resolution), including the clamped tails, and its
    hand-derived gradient matches JAX autodiff of the same form."""
    a = jnp.asarray(np.concatenate([
        np.linspace(-50.0, 50.0, 20001),
        np.linspace(-6.5, 6.5, 50001),
    ]), jnp.float32)
    exact = a * 0.5 * (1.0 + jax.lax.erf(a / math.sqrt(2.0)))
    fast = _gelu_fast(a)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=1e-4)

    # analytic grad == autodiff of the same algebraic form
    val, dval = _gelu_fast_with_grad(a)
    np.testing.assert_allclose(np.asarray(val), np.asarray(fast), atol=1e-7)
    auto = jax.vmap(jax.grad(_gelu_fast))(a)
    np.testing.assert_allclose(np.asarray(dval), np.asarray(auto), atol=1e-5)
    # ... and tracks the exact erf-GELU derivative
    dexact = jax.vmap(jax.grad(
        lambda z: z * 0.5 * (1.0 + jax.lax.erf(z / math.sqrt(2.0)))))(a)
    np.testing.assert_allclose(np.asarray(dval), np.asarray(dexact), atol=5e-4)

    # huge/non-finite-safe inputs: saturated branch, no NaN/inf from t**2
    big = jnp.asarray([-1e30, -1e6, 1e6, 1e30], jnp.float32)
    out = np.asarray(_gelu_fast(big))
    np.testing.assert_allclose(out, [0.0, 0.0, 1e6, 1e30], rtol=1e-6)


def test_grads_flow():
    args = _inputs()

    def loss(*a):
        return jnp.sum(adaln_mlp(*a) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 4, 5, 6))(*args)
    for gr in grads:
        assert np.isfinite(np.asarray(gr)).all()
        assert float(jnp.abs(gr).max()) > 0


def test_pallas_bwd_matches_xla_vjp():
    """The fused Pallas backward (r5) must match the XLA-composition VJP at
    f32 working precision, including pad-row neutrality (N not a multiple
    of the row block)."""
    from mdgen_finetune_tpu.ops.adaln_mlp import _pallas_bwd, _xla_impl

    rng = np.random.default_rng(3)
    B, N, C = 2, 37, 128  # N=37: forces row padding in the kernel
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    sh = jnp.asarray(rng.normal(size=(B, C)) * 0.3, jnp.float32)
    sc = jnp.asarray(rng.normal(size=(B, C)) * 0.3, jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, C)) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(C, 4 * C)) * C ** -0.5, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(4 * C,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(4 * C, C)) * C ** -0.5, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    grad = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)

    _, vjp = jax.vjp(_xla_impl, x, sh, sc, g, w1, b1, w2, b2)
    want = vjp(grad)
    got = _pallas_bwd(x, sh, sc, g, w1, b1, w2, b2, grad,
                      interpret=True, block_rows=32)
    names = ["dx", "dsh", "dsc", "dg", "dw1", "db1", "dw2", "db2"]
    for nm, gw, gg in zip(names, want, got):
        gw, gg = np.asarray(gw, np.float64), np.asarray(gg, np.float64)
        denom = max(np.abs(gw).max(), 1e-8)
        assert np.abs(gg - gw).max() / denom < 5e-6, nm
