"""Smoke coverage: hyena training, no_offsets ablation, mpnn inference."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdgen_finetune_tpu.config import (
    DataConfig, MDGenConfig, ModelConfig, TaskConfig, TrainConfig, TransportConfig,
)
from mdgen_finetune_tpu.data import MDGenDataset, make_batch_iterator
from mdgen_finetune_tpu.data.featurize import featurize_atom14_batch
from mdgen_finetune_tpu.data.synthetic import make_synthetic_dataset
from mdgen_finetune_tpu.inference import InferenceEngine
from mdgen_finetune_tpu.training import Trainer


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("misc"))
    split = make_synthetic_dataset(d, ["AGHK"], num_frames=48)
    return d, split


def _model(**kw):
    return ModelConfig(num_layers=1, embed_dim=32, mha_heads=4, ipa_heads=2, ipa_head_dim=8,
                       ipa_qk=4, ipa_v=4, abs_pos_emb=True, use_bf16=False, **kw)


def _train_steps(cfg, split, steps=3):
    trainer = Trainer(cfg)
    ds = MDGenDataset(cfg, split)
    it = make_batch_iterator(ds, cfg.train.batch_size, seed=0)
    state = trainer.init_state(jax.random.key(0), next(it))
    state = trainer.fit(state, it, steps, jax.random.key(1), log_every=100)
    return trainer, ds, state


def test_hyena_training(data):
    d, split = data
    cfg = MDGenConfig(
        model=_model(hyena=True, prepend_ipa=True),
        transport=TransportConfig(sampling_method="euler", inference_steps=2),
        data=DataConfig(data_dir=d, num_frames=8, crop=4),
        task=TaskConfig(sim_condition=True),
        train=TrainConfig(batch_size=2, lr=1e-3),
    )
    _, _, state = _train_steps(cfg, split)
    assert int(state.step) == 3


def test_no_offsets_training(data):
    d, split = data
    cfg = MDGenConfig(
        model=_model(prepend_ipa=True),
        transport=TransportConfig(sampling_method="euler", inference_steps=2),
        data=DataConfig(data_dir=d, num_frames=8, crop=4),
        task=TaskConfig(sim_condition=True, no_offsets=True),
        train=TrainConfig(batch_size=2, lr=1e-3),
    )
    _, _, state = _train_steps(cfg, split)
    assert int(state.step) == 3


def test_mpnn_inference(data):
    d, split = data
    cfg = MDGenConfig(
        model=_model(prepend_ipa=True, no_aa_emb=True, abs_time_emb=False),
        transport=TransportConfig(sampling_method="euler", inference_steps=2),
        data=DataConfig(data_dir=d, num_frames=8, crop=4),
        task=TaskConfig(mpnn=True, design=True, no_torsion=True),
        train=TrainConfig(batch_size=2, lr=1e-3),
    )
    trainer, ds, state = _train_steps(cfg, split)
    engine = InferenceEngine(cfg, state.params, dtype=jnp.float32)
    b = ds.batch(np.random.default_rng(0), 1)
    feats = featurize_atom14_batch(jnp.asarray(b["atom14"]), jnp.asarray(b["seqres"]), jnp.asarray(b["mask"]))
    atom14, aa_out = engine.sample(feats, jax.random.key(2))
    assert atom14.shape == (1, 8, 4, 14, 3)
    assert aa_out.shape[-1] == 4 and (np.asarray(aa_out) >= 0).all() and (np.asarray(aa_out) < 20).all()
    # structures are the ground-truth conditioning, not generated
    np.testing.assert_allclose(np.asarray(atom14), b["atom14"], atol=0.1)  # idealized reconstruction of f16 coords
