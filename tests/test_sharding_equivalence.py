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
