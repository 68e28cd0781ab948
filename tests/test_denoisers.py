"""Outsourced UNet denoiser: shape/grad sanity + DiffuserTrainer compatibility."""
import numpy as np

import jax
import jax.numpy as jnp

from mdgen_finetune_tpu.rtb.denoisers import UNetSeqDenoiser


def test_unet_seq_shapes_and_grads():
    model = UNetSeqDenoiser(out_dim=21, widths=(16, 32))
    B, T, L, D = 2, 4, 6, 21
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, L, D)), jnp.float32)
    t = jnp.asarray([0.1, 0.7])
    params = model.init(jax.random.key(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == (B, T, L, D)
    # zero-init output head
    np.testing.assert_allclose(np.asarray(out), 0.0)

    def loss(p):
        return jnp.sum(model.apply(p, x, t) ** 2) + sum(jnp.sum(l**2) for l in jax.tree.leaves(p))

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))
