"""Fused IPA-encoder kernel (ops/ipa_encoder.py) vs its XLA twin.

The twin (`encoder_xla`) is pinned bit-exactly to the IPALayer module stack
by tests/test_fused_trunk.py::test_parent_trunk_params_and_forward_match_per_layer;
here the Pallas kernel (interpret mode) must match the twin, forward and
gradient (the VJP recomputes through the twin by construction — the grad
check pins the custom-vjp wiring)."""
import jax
import jax.numpy as jnp
import numpy as np

from mdgen_finetune_tpu.geometry.rigid import Rigid
from mdgen_finetune_tpu.ops.ipa_encoder import (
    _encoder_pallas, encoder_xla)

B, L, C, Hm, Hi, Ch, Pq, Pv, NL = 4, 4, 128, 8, 4, 32, 8, 8, 2
HCh, HPq, HPv = Hi * Ch, Hi * Pq, Hi * Pv
FEAT = HCh + 4 * HPv

SHAPES = [(C,), (C,), (C, HCh), (HCh,), (C, HCh), (HCh,), (C, HCh), (HCh,),
          (C, 3 * HPq), (3 * HPq,), (C, 3 * HPq), (3 * HPq,),
          (C, 3 * HPv), (3 * HPv,), (Hi,), (FEAT, C), (C,),
          (C, 3 * C), (3 * C,), (C, C), (C,), (C,), (C,),
          (C, 4 * C), (4 * C,), (4 * C, C), (C,)]


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, L, C)), jnp.float32) * 0.5
    mods = jnp.asarray(rng.normal(size=(B, NL * 6 * C)), jnp.float32) * 0.2

    def w(s):
        sc = 0.3 if len(s) == 1 else (s[0] ** -0.5)
        return jnp.asarray(rng.normal(size=s), jnp.float32) * sc

    # ln scale near 1 (entry 0), everything else random
    ws = tuple(jnp.stack([w(s) + (1.0 if i == 0 else 0.0) for _ in range(NL)])
               for i, s in enumerate(SHAPES))
    t7 = rng.normal(size=(B, L, 7))
    t7[..., :4] += np.array([2.0, 0, 0, 0])  # bias toward identity quats
    frames = Rigid.from_tensor_7(jnp.asarray(t7, jnp.float32), normalize_quats=True)
    mask = np.ones((B, L), np.float32)
    mask[0, -1] = 0.0
    return x, mods, ws, frames, jnp.asarray(mask)


def _twin(x, mods, ws, frames, mask):
    lws = [tuple(wk[i] for wk in ws) for i in range(NL)]
    return encoder_xla(x, mods, lws, frames, mask, Hm, Hi, Ch, Pq, Pv, x.dtype)


def test_kernel_matches_twin():
    x, mods, ws, frames, mask = _setup()
    got = _encoder_pallas(x, mods, ws, frames.rot, frames.trans, mask,
                          Hm, Hi, Ch, Pq, Pv, True)
    ref = _twin(x, mods, ws, frames, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=2e-4)


def test_kernel_grads_match_twin():
    x, mods, ws, frames, mask = _setup(seed=3)
    w_out = jnp.asarray(np.random.default_rng(9).normal(size=(B, L, C)),
                        jnp.float32)

    def loss_k(x_, mods_, ws_):
        out = _encoder_pallas(x_, mods_, ws_, frames.rot, frames.trans, mask,
                              Hm, Hi, Ch, Pq, Pv, True)
        return jnp.sum(out * w_out)

    def loss_t(x_, mods_, ws_):
        return jnp.sum(_twin(x_, mods_, ws_, frames, mask) * w_out)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, mods, ws)
    gt = jax.grad(loss_t, argnums=(0, 1, 2))(x, mods, ws)
    for a, b in zip(jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(gt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-4)
