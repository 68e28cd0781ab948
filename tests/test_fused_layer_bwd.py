"""Fused Pallas backward (ops/fused_layer_bwd.py) gradient correctness.

Strategy: the XLA composition in bf16 is itself a rounded version of the f32
math, so exact comparison against it is meaningless. Instead both backwards
are scored against the f32 XLA composition (ground truth); the fused Pallas
backward must be within 2x of the XLA-bf16 backward's own error on every
parameter (in practice it is usually closer — it accumulates in f32).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdgen_finetune_tpu.ops.fused_layer import _layer_xla, fused_layer

NAMES = ["x", "mod", "wqkv_l", "bqkv_l", "wout_l", "bout_l", "wqkv_t", "bqkv_t",
         "wout_t", "bout_t", "w1", "b1", "w2", "b2", "bkl", "bvl", "bkt", "bvt"]


def _make(B, T, L, C, seed=0):
    rng = np.random.default_rng(seed)
    shapes = dict(x=(B, T * L, C), mod=(B, 9 * C), wqkv_l=(C, 3 * C), bqkv_l=(3 * C,),
                  wout_l=(C, C), bout_l=(C,), wqkv_t=(C, 3 * C), bqkv_t=(3 * C,),
                  wout_t=(C, C), bout_t=(C,), w1=(C, 4 * C), b1=(4 * C,),
                  w2=(4 * C, C), b2=(C,), bkl=(C,), bvl=(C,), bkt=(C,), bvt=(C,))
    vals = {k: rng.normal(size=shapes[k]) * (C ** -0.5 if k.startswith("w") else 0.4)
            for k in NAMES}
    mask = np.ones((B, T, L), np.float32)
    mask[:, -2:, -1] = 0.0
    w_out = rng.normal(size=(B, T * L, C))
    return vals, jnp.asarray(mask), jnp.asarray(w_out, jnp.float32)


def _grads(vals_np, mask, w_out, H, T, L, dtype, which):
    vs = [jnp.asarray(vals_np[k], dtype) for k in NAMES]

    def loss(*vv):
        if which == "pallas":
            out = fused_layer(*vv, mask, num_heads=H, tl=(T, L), force_pallas=True)
        else:
            out = _layer_xla(*vv, mask, H, T, L)
        return jnp.sum(out.astype(jnp.float32) * w_out)

    return jax.grad(loss, argnums=tuple(range(18)))(*vs)


@pytest.mark.parametrize("C,H", [(128, 8), (192, 8)])  # D=16 exact / D=24 lane-padded
def test_fused_bwd_matches_f32_truth(C, H):
    B, T, L = 2, 12, 4
    vals, mask, w_out = _make(B, T, L, C)
    g_truth = _grads(vals, mask, w_out, H, T, L, jnp.float32, "xla")
    g_xla = _grads(vals, mask, w_out, H, T, L, jnp.bfloat16, "xla")
    g_pal = _grads(vals, mask, w_out, H, T, L, jnp.bfloat16, "pallas")
    for k, gt, gx, gp in zip(NAMES, g_truth, g_xla, g_pal):
        gt = np.asarray(gt, np.float64)
        denom = max(np.abs(gt).max(), 1e-6)
        err_xla = np.abs(np.asarray(gx, np.float64) - gt).max() / denom
        err_pal = np.abs(np.asarray(gp, np.float64) - gt).max() / denom
        assert err_pal <= 2.0 * err_xla + 0.01, (
            f"{k}: pallas bwd err {err_pal:.4f} vs xla-bf16 err {err_xla:.4f}")


def test_fused_bwd_escape_hatch_matches_xla_vjp():
    """MDGEN_FUSED_BWD=xla must reproduce the old XLA-composition backward."""
    B, T, L, C, H = 2, 8, 4, 128, 8
    vals, mask, w_out = _make(B, T, L, C, seed=3)
    os.environ["MDGEN_FUSED_BWD"] = "xla"
    try:
        g_hatch = _grads(vals, mask, w_out, H, T, L, jnp.bfloat16, "pallas")
    finally:
        del os.environ["MDGEN_FUSED_BWD"]
    g_xla = _grads(vals, mask, w_out, H, T, L, jnp.bfloat16, "xla")
    for k, gh, gx in zip(NAMES, g_hatch, g_xla):
        np.testing.assert_allclose(np.asarray(gh, np.float32),
                                   np.asarray(gx, np.float32), rtol=0, atol=1e-5,
                                   err_msg=k)


def test_fused_bwd_pad_rows_zero():
    """T not a multiple of 8: gradients for the frame-pad rows must stay
    exactly zero through all three stage kernels (no weight contamination)."""
    B, T, L, C, H = 2, 11, 4, 128, 8
    vals, mask, w_out = _make(B, T, L, C, seed=5)
    g_truth = _grads(vals, mask, w_out, H, T, L, jnp.float32, "xla")
    g_pal = _grads(vals, mask, w_out, H, T, L, jnp.bfloat16, "pallas")
    for k, gt, gp in zip(NAMES, g_truth, g_pal):
        gt = np.asarray(gt, np.float64)
        denom = max(np.abs(gt).max(), 1e-6)
        err = np.abs(np.asarray(gp, np.float64) - gt).max() / denom
        assert err < 0.08, f"{k}: err {err:.4f} at non-multiple-of-8 T"


def test_fused_bwd_merged_matches_split():
    """The merged whole-layer backward (one pallas_call: MLP -> frame-attn ->
    residue-attn cores with VMEM-resident inter-stage cotangents; a measured
    perf dead-end kept behind MDGEN_FUSED_BWD=merged — see the module note)
    must reproduce the three-stage-kernel backward exactly — same cores,
    same f32 accumulation order, only the dx HBM round-trips removed."""
    B, T, L, C, H = 2, 12, 4, 192, 8  # D=24: the lane-padded stage-2 layout
    vals, mask, w_out = _make(B, T, L, C, seed=7)
    g_split = _grads(vals, mask, w_out, H, T, L, jnp.bfloat16, "pallas")
    os.environ["MDGEN_FUSED_BWD"] = "merged"
    try:
        g_merged = _grads(vals, mask, w_out, H, T, L, jnp.bfloat16, "pallas")
    finally:
        del os.environ["MDGEN_FUSED_BWD"]
    for k, gm, gs in zip(NAMES, g_merged, g_split):
        np.testing.assert_allclose(np.asarray(gm, np.float32),
                                   np.asarray(gs, np.float32), rtol=0, atol=0,
                                   err_msg=k)
