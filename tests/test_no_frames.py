"""no_frames ablation: raw atom37 coordinates as 111-dim latents (fixes the
reference's dataset.py:87 NameError path)."""
import numpy as np

import jax
import jax.numpy as jnp

from mdgen_finetune_tpu.config import (
    DataConfig, MDGenConfig, ModelConfig, TaskConfig, TrainConfig, TransportConfig,
)
from mdgen_finetune_tpu.data import MDGenDataset, make_batch_iterator
from mdgen_finetune_tpu.data.synthetic import make_synthetic_dataset
from mdgen_finetune_tpu.training import Trainer


def test_no_frames_training(tmp_path):
    d = str(tmp_path)
    split = make_synthetic_dataset(d, ["AGHK"], num_frames=48)
    cfg = MDGenConfig(
        model=ModelConfig(num_layers=1, embed_dim=32, mha_heads=4, prepend_ipa=False,
                          abs_pos_emb=True, use_bf16=False),
        transport=TransportConfig(sampling_method="euler", inference_steps=3),
        data=DataConfig(data_dir=d, num_frames=6, crop=4),
        task=TaskConfig(sim_condition=True, no_frames=True),
        train=TrainConfig(batch_size=2, lr=1e-3),
    )
    assert cfg.latent_dim == 111
    trainer = Trainer(cfg)
    ds = MDGenDataset(cfg, split)
    it = make_batch_iterator(ds, 2, seed=0)
    state = trainer.init_state(jax.random.key(0), next(it))
    state = trainer.fit(state, it, 4, jax.random.key(1), log_every=100)
    assert int(state.step) == 4
