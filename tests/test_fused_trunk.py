"""Whole-trunk mega-kernel (ops/fused_layer.fused_trunk) and the
parent-orchestrated denoiser trunk (models/denoiser.FusedLayerParams).

The parent path must be parameter-tree-interchangeable with the per-layer
modules (grad_checkpointing=True keeps those), produce identical outputs on
the XLA path, and the NL>1 Pallas mega-kernel (interpret mode) must match
the per-layer whole-layer kernel chain exactly (same ops, same order).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdgen_finetune_tpu.config import DataConfig, MDGenConfig, ModelConfig, TaskConfig
from mdgen_finetune_tpu.geometry.rigid import Rigid
from mdgen_finetune_tpu.models import LatentMDGen


def _mk_model(grad_ckpt):
    cfg = MDGenConfig(
        model=ModelConfig(num_layers=2, embed_dim=128, mha_heads=8,
                          prepend_ipa=True, abs_pos_emb=True,
                          grad_checkpointing=grad_ckpt),
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
    return dict(x=x, t=t, mask=mask, start_frames=frames, end_frames=frames,
                x_cond=jnp.zeros_like(x), x_cond_mask=jnp.zeros((B, T, L), jnp.int32),
                aatype=aatype)


def test_parent_trunk_params_and_forward_match_per_layer():
    """FusedLayerParams trees interchange with LatentMDGenLayer's, and the
    parent-orchestrated forward equals the per-layer forward bit-for-bit on
    the XLA path."""
    m_parent, cfg = _mk_model(grad_ckpt=False)   # parent_trunk path
    m_layer, _ = _mk_model(grad_ckpt=True)       # per-layer module path
    kw = _inputs(cfg)
    p1 = jax.jit(m_parent.init)(jax.random.key(0), **kw)
    p2 = jax.jit(m_layer.init)(jax.random.key(0), **kw)
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat2 = jax.tree_util.tree_leaves_with_path(p2)
    assert [jax.tree_util.keystr(k) for k, _ in flat1] == \
        [jax.tree_util.keystr(k) for k, _ in flat2]
    for (k, a), (_, b) in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(k))
    o1 = jax.jit(m_parent.apply)(p1, **kw)
    o2 = jax.jit(m_layer.apply)(p2, **kw)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_parent_trunk_grads_match_per_layer():
    m_parent, cfg = _mk_model(grad_ckpt=False)
    m_layer, _ = _mk_model(grad_ckpt=True)
    kw = _inputs(cfg, seed=1)
    params = jax.jit(m_parent.init)(jax.random.key(0), **kw)

    def loss(m):
        return lambda p: jnp.sum(jnp.square(jax.jit(m.apply)(p, **kw)))

    g1 = jax.grad(loss(m_parent))(params)
    g2 = jax.grad(loss(m_layer))(params)
    for (k, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g1),
                              jax.tree_util.tree_leaves_with_path(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(k))


@pytest.mark.parametrize("T", [8, 11])
def test_mega_kernel_matches_per_layer_chain(T):
    """NL=3 Pallas mega-kernel (interpret) == chained per-layer whole-layer
    kernels (interpret): identical ops in identical order -> exact match,
    forward and gradients."""
    from mdgen_finetune_tpu.ops.fused_layer import (
        _fused_layer_pallas, _fused_trunk_pallas, _pad_trunk, _unpad_trunk)

    B, L, C, H, NL = 2, 4, 128, 8, 3
    rng = np.random.default_rng(7)
    r = lambda *s, sc=0.2: jnp.asarray(rng.normal(size=s), jnp.bfloat16) * sc
    x = r(B, T * L, C, sc=0.5)
    mods = r(B, NL * 9 * C)
    shapes = [(C, 3 * C), (3 * C,), (C, C), (C,), (C, 3 * C), (3 * C,), (C, C), (C,),
              (C, 4 * C), (4 * C,), (4 * C, C), (C,), (C,), (C,), (C,), (C,)]
    ws = tuple(jnp.stack([r(*s, sc=C ** -0.5 if len(s) == 2 else 0.3)
                          for _ in range(NL)]) for s in shapes)
    mask = np.ones((B, T, L), np.float32)
    mask[:, -1, -1] = 0.0
    mask = jnp.asarray(mask)
    w_out = jnp.asarray(rng.normal(size=(B, T * L, C)), jnp.float32)
    xp = _pad_trunk(x, T, L, C)

    def mega(xp_, mods_, *flat):
        return _fused_trunk_pallas(xp_, mods_, tuple(flat), None, mask, H, T, L, True)

    def chain(xp_, mods_, *flat):
        h = xp_
        for i in range(NL):
            h = _fused_layer_pallas(
                h, mods_[:, i * 9 * C:(i + 1) * 9 * C],
                *(w[i] for w in flat), mask, H, T, L, True, True)
        return h

    o1 = mega(xp, mods, *ws)
    o2 = chain(xp, mods, *ws)
    np.testing.assert_array_equal(
        np.asarray(_unpad_trunk(o1, T, L, C), np.float32),
        np.asarray(_unpad_trunk(o2, T, L, C), np.float32))

    def loss(fn):
        def f(xp_, mods_, *flat):
            out = _unpad_trunk(fn(xp_, mods_, *flat), T, L, C)
            return jnp.sum(out.astype(jnp.float32) * w_out)
        return f

    g1 = jax.grad(loss(mega), argnums=(0, 1, 2, 10))(xp, mods, *ws)
    g2 = jax.grad(loss(chain), argnums=(0, 1, 2, 10))(xp, mods, *ws)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), rtol=0, atol=2e-5)


def test_folded_final_head_matches_xla(T=8):
    """final=(modf, wfin, bfin): the kernel's folded output head (interpret)
    matches _trunk_final_xla on the chained per-layer output — forward and
    gradients (incl. the head's own weights)."""
    from mdgen_finetune_tpu.ops.fused_layer import (
        _fused_layer_pallas, _fused_trunk_pallas, _pad_trunk, _trunk_final_xla)

    B, L, C, H, NL, OUTC = 2, 4, 128, 8, 2, 21
    rng = np.random.default_rng(11)
    r = lambda *s, sc=0.2: jnp.asarray(rng.normal(size=s), jnp.bfloat16) * sc
    x = r(B, T * L, C, sc=0.5)
    mods = r(B, NL * 9 * C)
    shapes = [(C, 3 * C), (3 * C,), (C, C), (C,), (C, 3 * C), (3 * C,), (C, C), (C,),
              (C, 4 * C), (4 * C,), (4 * C, C), (C,), (C,), (C,), (C,), (C,)]
    ws = tuple(jnp.stack([r(*s, sc=C ** -0.5 if len(s) == 2 else 0.3)
                          for _ in range(NL)]) for s in shapes)
    modf = r(B, 2 * C)
    wfin = jnp.asarray(rng.normal(size=(C, OUTC)), jnp.float32) * 0.1
    bfin = jnp.asarray(rng.normal(size=(OUTC,)), jnp.float32) * 0.1
    mask = jnp.ones((B, T, L), jnp.float32)
    xp = _pad_trunk(x, T, L, C)

    def folded(xp_, mods_, modf_, wfin_, bfin_, *flat):
        return _fused_trunk_pallas(xp_, mods_, tuple(flat),
                                   (modf_, wfin_, bfin_), mask, H, T, L, True)

    def ref(xp_, mods_, modf_, wfin_, bfin_, *flat):
        h = xp_
        for i in range(NL):
            h = _fused_layer_pallas(
                h, mods_[:, i * 9 * C:(i + 1) * 9 * C],
                *(w[i] for w in flat), mask, H, T, L, True, True)
        return _trunk_final_xla(h, modf_, wfin_, bfin_, T, L, C)

    o1 = folded(xp, mods, modf, wfin, bfin, *ws)
    o2 = ref(xp, mods, modf, wfin, bfin, *ws)
    assert o1.shape == o2.shape and o1.dtype == jnp.float32
    # the two kernel paths may round a borderline bf16 trunk activation to
    # adjacent quanta (observed: exactly one 2^-9 step on 1/8192 elements
    # after the exp2 softmax landed): all but <=0.1% of elements are pinned
    # at 2e-5, the worst element at one bf16 ULP of the activation scale
    d = np.abs(np.asarray(o1) - np.asarray(o2))
    assert d.max() <= 2.5e-3, d.max()
    assert (d > 2e-5).mean() <= 1e-3, (d > 2e-5).mean()

    w_out = jnp.asarray(rng.normal(size=o1.shape), jnp.float32)

    def loss(fn):
        return lambda *aa: jnp.sum(fn(*aa) * w_out)

    g1 = jax.grad(loss(folded), argnums=(0, 1, 2, 3, 4, 5))(xp, mods, modf, wfin, bfin, *ws)
    g2 = jax.grad(loss(ref), argnums=(0, 1, 2, 3, 4, 5))(xp, mods, modf, wfin, bfin, *ws)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), rtol=0, atol=3e-5)


def test_prepadded_pack_matches_raw(T=8):
    """pad_stage2_ws pre-padding (hoisted pack) must be output- and
    gradient-equivalent to passing raw weights, in the lane-padded head
    regime (C=192, H=8 -> D=24, Dp=32)."""
    from mdgen_finetune_tpu.ops.fused_layer import (
        _fused_trunk_pallas, _pad_trunk, pad_stage2_ws, unpad_stage2_ws)

    B, L, C, H, NL = 2, 4, 192, 8, 2
    rng = np.random.default_rng(21)
    r = lambda *s, sc=0.2: jnp.asarray(rng.normal(size=s), jnp.bfloat16) * sc
    x = _pad_trunk(r(B, T * L, C, sc=0.5), T, L, C)
    mods = r(B, NL * 9 * C)
    shapes = [(C, 3 * C), (3 * C,), (C, C), (C,), (C, 3 * C), (3 * C,), (C, C), (C,),
              (C, 4 * C), (4 * C,), (4 * C, C), (C,), (C,), (C,), (C,), (C,)]
    ws = tuple(jnp.stack([r(*s, sc=C ** -0.5 if len(s) == 2 else 0.3)
                          for _ in range(NL)]) for s in shapes)
    wsp = pad_stage2_ws(ws, H)
    assert wsp[4].shape[-1] == 3 * 8 * 32
    for a, b in zip(unpad_stage2_ws(wsp, H), ws):
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32))
    mask = jnp.ones((B, T, L), jnp.float32)

    def run(wset):
        return lambda x_, mods_, *flat: _fused_trunk_pallas(
            x_, mods_, tuple(flat), None, mask, H, T, L, True)

    o1 = run(ws)(x, mods, *ws)
    o2 = run(wsp)(x, mods, *wsp)
    np.testing.assert_array_equal(np.asarray(o1, np.float32), np.asarray(o2, np.float32))

    w_out = jnp.asarray(rng.normal(size=o1.shape), jnp.float32)

    def loss(fn, wset):
        return lambda x_, mods_: jnp.sum(fn(x_, mods_, *wset).astype(jnp.float32) * w_out)

    g1 = jax.grad(loss(run(ws), ws), argnums=(0, 1))(x, mods)
    g2 = jax.grad(loss(run(wsp), wsp), argnums=(0, 1))(x, mods)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), rtol=0, atol=1e-5)
