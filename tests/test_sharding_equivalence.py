"""Sequence-parallel sharding must not change the math: sp=4 vs single device."""
import numpy as np

import jax
import jax.numpy as jnp

from mdgen_finetune_tpu.config import (
    DataConfig, MDGenConfig, ModelConfig, TaskConfig, TrainConfig, TransportConfig,
)
from mdgen_finetune_tpu.data.synthetic import synthesize_trajectory
from mdgen_finetune_tpu.parallel.mesh import make_mesh, shard_batch
from mdgen_finetune_tpu.training import Trainer


def _cfg(dp, sp):
    return MDGenConfig(
        model=ModelConfig(num_layers=1, embed_dim=32, mha_heads=4, ipa_heads=2, ipa_head_dim=8,
                          ipa_qk=4, ipa_v=4, prepend_ipa=True, abs_pos_emb=True, use_bf16=False),
        transport=TransportConfig(sampling_method="euler", inference_steps=2),
        data=DataConfig(num_frames=8, crop=4),
        task=TaskConfig(sim_condition=True),
        train=TrainConfig(batch_size=2, lr=1e-3, dp_size=dp, sp_size=sp),
    )


def _batch(B=2, T=8):
    atom14 = np.stack([synthesize_trajectory("AAGH", T, seed=i).astype(np.float32) for i in range(B)])
    return {"atom14": atom14, "seqres": np.tile(np.array([0, 0, 7, 6], np.int32), (B, 1)),
            "mask": np.ones((B, 4), np.float32)}


def test_shard_batch_is_key_aware():
    """(B, L) fields must not land on the sp axis (their dim 1 is residues,
    not frames) — sp-sharding them forces XLA to reshard inside the step."""
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(2, 4)
    db = shard_batch(mesh, _batch())
    assert db["atom14"].sharding.spec == P("dp", "sp")
    assert db["seqres"].sharding.spec == P("dp")
    assert db["mask"].sharding.spec == P("dp")


def _alltoall_count(trainer, state, db, key):
    lowered = jax.jit(trainer._step, donate_argnums=(0,)).lower(state, db, key)
    txt = lowered.compile().as_text()
    return txt.count("all-to-all")


def test_sp_mesh_no_extra_reshard_collectives():
    """Key-aware shard_batch must not add resharding all-to-alls beyond what
    deliberately mis-sharding the (B, L) fields over sp costs (VERDICT r1 #10)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch = _batch()
    mesh = make_mesh(2, 4)
    trainer = Trainer(_cfg(2, 4), mesh=mesh)
    state = trainer.init_state(jax.random.key(0), batch)
    key = jax.random.key(1)

    good = shard_batch(mesh, batch)
    bad = dict(good)
    for k in ("seqres", "mask"):  # the round-1 ndim-based placement
        bad[k] = jax.device_put(np.asarray(batch[k]), NamedSharding(mesh, P("dp", "sp")))

    n_good = _alltoall_count(trainer, state, good, key)
    n_bad = _alltoall_count(trainer, state, bad, key)
    assert n_good <= n_bad, (n_good, n_bad)


def test_sp_sharded_loss_matches_single_device():
    batch = _batch()
    losses = {}
    for dp, sp in [(1, 1), (2, 4)]:
        mesh = make_mesh(dp, sp)
        trainer = Trainer(_cfg(dp, sp), mesh=mesh)
        state = trainer.init_state(jax.random.key(0), batch)
        db = shard_batch(mesh, batch)
        state, m = trainer.train_step(state, db, jax.random.key(1))
        losses[(dp, sp)] = float(m["loss"])
    assert abs(losses[(1, 1)] - losses[(2, 4)]) < 1e-4, losses
