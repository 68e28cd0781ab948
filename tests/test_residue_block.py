"""Fused small-L residue-attention BLOCK kernel (ops/residue_block.py):
parity with its XLA twin (which is the exact composition it replaced in
fused_layer._layer_kernels) plus gradient flow through the custom VJP."""
import jax
import jax.numpy as jnp
import numpy as np


def _make_args(rng, B, T, L, C, H):
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
    mask = jnp.asarray(rng.integers(0, 2, size=(B, T, L)), jnp.float32)
    mask = mask.at[:, :, 0].set(1.0)
    return x, sh, sc, g, wqkv, bqkv, wout, bout, bk, bv, mask


def test_s1_block_matches_xla_twin():
    from mdgen_finetune_tpu.ops.residue_block import _s1_block_call, _s1_xla

    rng = np.random.default_rng(11)
    # T=24 divides into frame blocks; T=13 exercises the pad-frame path
    for B, T, L in [(2, 24, 3), (2, 13, 4)]:
        C, H = 32, 4
        args = _make_args(rng, B, T, L, C, H)
        ref = _s1_xla(*args, H, T, L)
        got = _s1_block_call(*args, H, T, L, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-5, rtol=1e-4,
                                   err_msg=f"T={T} L={L}")


def test_s1_block_grads_match_twin():
    from mdgen_finetune_tpu.ops.residue_block import _s1_block_pallas, _s1_xla

    rng = np.random.default_rng(12)
    B, T, L, C, H = 2, 16, 3, 32, 4
    args = _make_args(rng, B, T, L, C, H)

    def loss_pallas(x, wqkv, g):
        a = (x,) + args[1:3] + (g,) + (wqkv,) + args[5:]
        return jnp.sum(_s1_block_pallas(*a, H, T, L, True) ** 2)

    def loss_xla(x, wqkv, g):
        a = (x,) + args[1:3] + (g,) + (wqkv,) + args[5:]
        return jnp.sum(_s1_xla(*a, H, T, L) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(args[0], args[4], args[3])
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(args[0], args[4], args[3])
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-3)


def test_s1_block_under_mesh():
    """residue_block through the dp mesh (shard_map over batch) matches the
    single-device call."""
    from mdgen_finetune_tpu.ops.residue_block import residue_block, _s1_xla
    from mdgen_finetune_tpu.parallel.kernel_sharding import kernel_mesh
    from mdgen_finetune_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(13)
    B, T, L, C, H = 4, 16, 3, 128, 4
    args = _make_args(rng, B, T, L, C, H)
    ref = _s1_xla(*args, H, T, L)

    mesh = make_mesh(dp_size=4, sp_size=1)
    with kernel_mesh(mesh):
        got = residue_block(*args, num_heads=H, tl=(T, L), force_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)
