"""Fused AdaLN-MLP kernel: parity with the XLA composition (interpret mode)
and gradient plumbing."""
import numpy as np

import jax
import jax.numpy as jnp

from mdgen_finetune_tpu.ops.adaln_mlp import _pallas_fwd, _xla_impl, adaln_mlp


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


def test_grads_flow():
    args = _inputs()

    def loss(*a):
        return jnp.sum(adaln_mlp(*a) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 4, 5, 6))(*args)
    for gr in grads:
        assert np.isfinite(np.asarray(gr)).all()
        assert float(jnp.abs(gr).max()) > 0
