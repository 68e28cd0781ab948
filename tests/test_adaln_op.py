"""Fused AdaLN op: equivalence with the layer_norm+modulate composition."""
import numpy as np

import jax
import jax.numpy as jnp

from mdgen_finetune_tpu.models.layers import layer_norm, modulate
from mdgen_finetune_tpu.ops.adaln import adaln_modulate, _adaln_xla


def test_adaln_matches_composition():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 5, 4, 32)), jnp.float32)
    shift = jnp.asarray(rng.normal(size=(2, 32)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(2, 32)) * 0.1, jnp.float32)
    ref = modulate(layer_norm(x), shift, scale)
    out = adaln_modulate(x, shift, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # gradients of the XLA composition match autodiff of the building blocks
    g1 = jax.grad(lambda *a: jnp.sum(adaln_modulate(*a) ** 2), argnums=(0, 1, 2))(x, shift, scale)
    g2 = jax.grad(lambda *a: jnp.sum(modulate(layer_norm(a[0]), a[1], a[2]) ** 2), argnums=(0, 1, 2))(
        x, shift, scale
    )
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
