"""Fused (B,T,L,C)-layout frame-attention kernel: parity with the XLA
reference composition (interpret mode on CPU) and gradient plumbing."""
import numpy as np

import jax
import jax.numpy as jnp

from mdgen_finetune_tpu.ops.time_attention import _pallas_fwd, _xla_impl, time_attention


def _inputs(B=2, T=10, L=3, C=32, seed=0, masked=False):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, T, L, C)), jnp.float32) * 0.5
    k = jnp.asarray(rng.normal(size=(B, T, L, C)), jnp.float32) * 0.5
    v = jnp.asarray(rng.normal(size=(B, T, L, C)), jnp.float32) * 0.5
    bk = jnp.asarray(rng.normal(size=(1, 1, C)), jnp.float32) * 0.1
    bv = jnp.asarray(rng.normal(size=(1, 1, C)), jnp.float32) * 0.1
    if masked:
        mask = jnp.asarray(rng.integers(0, 2, size=(B, L, T)), jnp.float32)
        mask = mask.at[:, :, 0].set(1.0)  # at least one valid key
    else:
        mask = jnp.ones((B, L, T), jnp.float32)
    return q, k, v, bk, bv, mask


def test_kernel_matches_xla_reference():
    for T, masked in [(10, False), (10, True), (300, False)]:
        q, k, v, bk, bv, mask = _inputs(T=T, masked=masked)
        ref = _xla_impl(q, k, v, bk, bv, mask, 4)
        got = _pallas_fwd(q, k, v, bk, bv, mask, 4, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4), (T, masked)


def test_time_attention_grads_flow():
    q, k, v, bk, bv, mask = _inputs()

    def loss(q, k, v, bk, bv):
        out = time_attention(q, k, v, bk, bv, mask, num_heads=4)
        return jnp.sum(out**2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(q, k, v, bk, bv)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


def test_mha_4d_path_matches_3d_path():
    """MultiheadAttention(x 4D, mask (B,L,T)) == the old transpose-based 3D
    call — the module contract the denoiser layer now relies on."""
    from mdgen_finetune_tpu.models.attention import MultiheadAttention

    B, T, L, C = 2, 6, 3, 32
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, T, L, C)), jnp.float32)
    mask = jnp.ones((B, T, L), jnp.float32)
    mha = MultiheadAttention(C, 4, use_rope=True)
    params = mha.init(jax.random.key(0), x.transpose(0, 2, 1, 3).reshape(B * L, T, C))

    old = mha.apply(params, x.transpose(0, 2, 1, 3).reshape(B * L, T, C),
                    mask=mask.transpose(0, 2, 1).reshape(B * L, T))
    old = old.reshape(B, L, T, C).transpose(0, 2, 1, 3)
    new = mha.apply(params, x, mask=mask.transpose(0, 2, 1))
    np.testing.assert_allclose(np.asarray(new), np.asarray(old), atol=1e-5, rtol=1e-5)


def test_blocked_kernel_matches_xla_reference():
    from mdgen_finetune_tpu.ops.time_attention import _pallas_fwd_blocked

    for T, L, masked in [(24, 3, False), (24, 3, True), (40, 6, False)]:
        q, k, v, bk, bv, mask = _inputs(T=T, L=L, masked=masked)
        ref = _xla_impl(q, k, v, bk, bv, mask, 4)
        got = _pallas_fwd_blocked(q, k, v, bk, bv, mask, 4, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4), (T, L, masked)


def test_fused_block_matches_xla_composition():
    from mdgen_finetune_tpu.ops.time_attention import _block_pallas_fwd, _block_xla

    rng = np.random.default_rng(3)
    B, T, L, C, H = 2, 10, 3, 32, 4
    N = T * L
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32) * 0.5
    sh = jnp.asarray(rng.normal(size=(B, C)), jnp.float32) * 0.2
    sc = jnp.asarray(rng.normal(size=(B, C)), jnp.float32) * 0.2
    g = jnp.asarray(rng.normal(size=(B, C)), jnp.float32) * 0.5
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)), jnp.float32) * 0.1
    bqkv = jnp.asarray(rng.normal(size=(3 * C,)), jnp.float32) * 0.05
    wout = jnp.asarray(rng.normal(size=(C, C)), jnp.float32) * 0.1
    bout = jnp.asarray(rng.normal(size=(C,)), jnp.float32) * 0.05
    bk = jnp.asarray(rng.normal(size=(1, 1, C)), jnp.float32) * 0.1
    bv = jnp.asarray(rng.normal(size=(1, 1, C)), jnp.float32) * 0.1
    mask = jnp.asarray(rng.integers(0, 2, size=(B, L, T)), jnp.float32).at[:, :, 0].set(1.0)

    ref = _block_xla(x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, mask, H, T, L)
    got = _block_pallas_fwd(x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, mask,
                            H, T, L, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_blocked_fused_block_matches_xla_composition():
    """Blocked whole-block kernel (grid (B, L), LN+mod+qkv+attend+out-proj+
    gate in-kernel — the large-L/long-T path): parity with _block_xla, plus
    gradient flow through its custom VJP."""
    from mdgen_finetune_tpu.ops.time_attention import (
        _block_pallas_fwd_blocked, _block_xla, _time_block_pallas_blocked)

    rng = np.random.default_rng(7)
    # C=32/H=4: compact layout (D=8 divides 128); C=96/H=4: the lane-PADDED
    # head layout (D=24 -> Dp=32, the flagship head shape's route)
    for C, H in [(32, 4), (96, 4)]:
        B, T, L = 2, 24, 3
        N = T * L
        x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32) * 0.5
        sh = jnp.asarray(rng.normal(size=(B, C)), jnp.float32) * 0.2
        sc = jnp.asarray(rng.normal(size=(B, C)), jnp.float32) * 0.2
        g = jnp.asarray(rng.normal(size=(B, C)), jnp.float32) * 0.5
        wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)), jnp.float32) * 0.1
        bqkv = jnp.asarray(rng.normal(size=(3 * C,)), jnp.float32) * 0.05
        wout = jnp.asarray(rng.normal(size=(C, C)), jnp.float32) * 0.1
        bout = jnp.asarray(rng.normal(size=(C,)), jnp.float32) * 0.05
        bk = jnp.asarray(rng.normal(size=(1, 1, C)), jnp.float32) * 0.1
        bv = jnp.asarray(rng.normal(size=(1, 1, C)), jnp.float32) * 0.1
        mask = jnp.asarray(rng.integers(0, 2, size=(B, L, T)), jnp.float32).at[:, :, 0].set(1.0)

        ref = _block_xla(x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, mask, H, T, L)
        got = _block_pallas_fwd_blocked(x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv,
                                        mask, H, T, L, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-5, rtol=1e-4, err_msg=f"C={C} H={H}")
    # gradient flow through the custom VJP (runs on the padded-layout shapes
    # from the loop's last iteration)

    def loss(x, wqkv, g):
        return jnp.sum(_time_block_pallas_blocked(
            x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, mask, H, T, L, True) ** 2)

    gx, gw, gg = jax.grad(loss, argnums=(0, 1, 2))(x, wqkv, g)
    rl = jax.grad(lambda x, w, g: jnp.sum(_block_xla(
        x, sh, sc, g, wqkv if False else w, bqkv, wout, bout, bk, bv, mask, H, T, L) ** 2),
        argnums=(0, 1, 2))(x, wqkv, g)
    for a, b in zip((gx, gw, gg), rl):
        # hand-fused blocked backward vs XLA autodiff: f32-accumulation-level
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=2e-3)


def _block_inputs(rng, B, C, n_rows):
    r = lambda *s, sc=0.2: jnp.asarray(rng.normal(size=s), jnp.float32) * sc
    x = r(B, n_rows, C, sc=0.5)
    sh, sc_, g = r(B, C), r(B, C), r(B, C, sc=0.5)
    wqkv = r(C, 3 * C, sc=0.1)
    bqkv = r(3 * C, sc=0.05)
    wout = r(C, C, sc=0.1)
    bout = r(C, sc=0.05)
    bk = r(1, 1, C, sc=0.1)
    bv = r(1, 1, C, sc=0.1)
    return x, sh, sc_, g, wqkv, bqkv, wout, bout, bk, bv


def test_rows_kernel_matches_xla_reference():
    """Rank-4 residue-rows kernel (_block_pallas_fwd_blocked_rows, grid
    (B, T) over frames — the large-L TPU routing in _layer_kernels): parity
    with _res_rows_xla (the swap-axes composition it replaced), including an
    ALL-MASKED frame (kept finite by the always-attendable bias-KV token)
    and the D=24 lane-padded head layout (Dp=32), plus gradients through
    the custom VJP (advisor r3)."""
    from mdgen_finetune_tpu.ops.time_attention import (
        _block_pallas_fwd_blocked_rows, _res_rows_block_pallas, _res_rows_xla)

    rng = np.random.default_rng(13)
    B, T, L = 2, 5, 12
    for C, H in [(32, 4), (96, 4)]:  # compact / lane-padded head layouts
        x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv = _block_inputs(rng, B, C, T * L)
        mask = jnp.asarray(rng.integers(0, 2, size=(B, T, L)), jnp.float32)
        mask = mask.at[:, :, 0].set(1.0).at[:, 2, :].set(0.0)  # frame 2 all-masked

        ref = _res_rows_xla(x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv,
                            mask, H, T, L)
        got = _block_pallas_fwd_blocked_rows(x, sh, sc, g, wqkv, bqkv, wout,
                                             bout, bk, bv, mask, H, T, L,
                                             interpret=True)
        assert np.isfinite(np.asarray(got)).all()
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-5, rtol=1e-3, err_msg=f"C={C}")

    def loss_k(x, wqkv, g):
        return jnp.sum(_res_rows_block_pallas(
            x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, mask, H, T, L, True) ** 2)

    def loss_r(x, wqkv, g):
        return jnp.sum(_res_rows_xla(
            x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, mask, H, T, L) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, wqkv, g)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, wqkv, g)
    for a, b in zip(gk, gr):
        # hand-fused blocked backward vs XLA autodiff: bf16-cast points in
        # the kernel's recompute differ from the twin's, f32-accumulation-
        # level agreement
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=2e-3)


def test_blocked_t_logical_matches_sliced_composition():
    """Padded-frames blocked path (t_logical < T: x arrives frame-padded,
    pad frames are zero-masked garbage, the bias-KV token ropes at position
    t_logical): forward parity with _block_xla_tl — the sliced unpadded
    composition — on the REAL frames, finiteness everywhere (all-masked pad
    frames attend only the bias token), and gradients through the
    _time_block_pallas_blocked VJP twin (advisor r3)."""
    from mdgen_finetune_tpu.ops.time_attention import (
        _block_pallas_fwd_blocked, _block_xla_tl, _time_block_pallas_blocked)

    rng = np.random.default_rng(17)
    B, T, L, TL = 2, 16, 3, 13
    for C, H in [(32, 4), (96, 4)]:  # compact / lane-padded head layouts
        x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv = _block_inputs(rng, B, C, T * L)
        kv = jnp.asarray(rng.integers(0, 2, size=(B, L, T)), jnp.float32)
        kv = kv.at[:, :, 0].set(1.0).at[:, :, TL:].set(0.0)  # pad frames masked

        ref = _block_xla_tl(x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv,
                            kv, H, T, L, TL)
        got = _block_pallas_fwd_blocked(x, sh, sc, g, wqkv, bqkv, wout, bout,
                                        bk, bv, kv, H, T, L, interpret=True,
                                        t_logical=TL)
        assert np.isfinite(np.asarray(got)).all()
        np.testing.assert_allclose(
            np.asarray(got).reshape(B, T, L, C)[:, :TL],
            np.asarray(ref).reshape(B, T, L, C)[:, :TL],
            atol=5e-5, rtol=1e-3, err_msg=f"C={C}")

    def real_frames(out):
        return out.reshape(B, T, L, C)[:, :TL]

    def loss_k(x, wqkv, g):
        return jnp.sum(real_frames(_time_block_pallas_blocked(
            x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, kv,
            H, T, L, True, TL)) ** 2)

    def loss_r(x, wqkv, g):
        return jnp.sum(real_frames(_block_xla_tl(
            x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, kv,
            H, T, L, TL)) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, wqkv, g)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, wqkv, g)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=2e-3)
