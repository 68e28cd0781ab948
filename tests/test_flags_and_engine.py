"""Flag fidelity (dropout / train_batches / val_repeat) + engine SDE/likelihood surface."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdgen_finetune_tpu.config import (
    DataConfig, MDGenConfig, ModelConfig, TaskConfig, TrainConfig, TransportConfig,
)


def _tiny_cfg(d, **model_kw):
    return MDGenConfig(
        model=ModelConfig(
            num_layers=1, embed_dim=32, mha_heads=4, ipa_heads=2, ipa_head_dim=8,
            ipa_qk=4, ipa_v=4, prepend_ipa=True, abs_pos_emb=True, use_bf16=False,
            **model_kw,
        ),
        transport=TransportConfig(sampling_method="euler", inference_steps=2),
        data=DataConfig(data_dir=d, num_frames=4, crop=4),
        task=TaskConfig(sim_condition=True),
        train=TrainConfig(batch_size=2, lr=1e-3),
    )


def test_mha_dropout_is_stochastic_in_train_mode():
    from mdgen_finetune_tpu.models.attention import MultiheadAttention

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 6, 32)), jnp.float32)
    mask = jnp.ones((2, 6))
    mha = MultiheadAttention(32, 4, dropout=0.5)
    params = mha.init(jax.random.key(0), x, mask)

    eval_out = mha.apply(params, x, mask)  # train=False: deterministic
    eval_out2 = mha.apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(eval_out), np.asarray(eval_out2))

    t1 = mha.apply(params, x, mask, train=True, rngs={"dropout": jax.random.key(1)})
    t2 = mha.apply(params, x, mask, train=True, rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
    assert not np.allclose(np.asarray(t1), np.asarray(eval_out))

    # dropout=0 module ignores train flag entirely
    mha0 = MultiheadAttention(32, 4, dropout=0.0)
    o0 = mha0.apply(params, x, mask, train=True)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(eval_out), atol=1e-6)

    # 4D factorized paths accept dropout too (fold to the dense view)
    x4 = jnp.asarray(rng.normal(size=(2, 3, 6, 32)), jnp.float32)
    m_res = jnp.ones((2, 3, 6))
    r1 = mha.apply(params, x4, m_res, axis="residue", train=True, rngs={"dropout": jax.random.key(3)})
    r_eval = mha.apply(params, x4, m_res, axis="residue")
    assert r1.shape == x4.shape and not np.allclose(np.asarray(r1), np.asarray(r_eval))


def test_model_dropout_flag_changes_training_loss(tmp_path):
    """--dropout is consumed: the training loss becomes rng-dependent."""
    from mdgen_finetune_tpu.data.synthetic import make_synthetic_dataset
    from mdgen_finetune_tpu.data import MDGenDataset
    from mdgen_finetune_tpu.training import Trainer

    d = str(tmp_path)
    split = make_synthetic_dataset(d, ["AGHK"], num_frames=16)
    cfg = _tiny_cfg(d, dropout=0.5)
    tr = Trainer(cfg, dtype=jnp.float32)
    ds = MDGenDataset(cfg, split)
    batch = {k: jnp.asarray(v) for k, v in ds.batch(np.random.default_rng(0), 2).items() if k != "name"}
    state = tr.init_state(jax.random.key(0), ds.batch(np.random.default_rng(0), 2))

    # same transport rng, different dropout rng -> different loss
    l1, _ = tr._loss_fn(state.params, jax.random.key(5), batch)
    l2, _ = tr._loss_fn(state.params, jax.random.key(6), batch)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))

    cfg0 = _tiny_cfg(d, dropout=0.0)
    tr0 = Trainer(cfg0, dtype=jnp.float32)
    l3, _ = tr0._loss_fn(state.params, jax.random.key(5), batch)
    l4, _ = tr0._loss_fn(state.params, jax.random.key(5), batch)
    np.testing.assert_allclose(float(l3), float(l4))  # no-dropout path deterministic


def test_val_repeat_multiplies_epoch_length(tmp_path):
    from mdgen_finetune_tpu.data.synthetic import make_synthetic_dataset
    from mdgen_finetune_tpu.data import MDGenDataset

    d = str(tmp_path)
    split = make_synthetic_dataset(d, ["AGHK", "FNYK"], num_frames=8)
    cfg = _tiny_cfg(d)
    assert len(MDGenDataset(cfg, split)) == 2
    assert len(MDGenDataset(cfg, split, repeat=25)) == 50  # reference train.py:30


def test_engine_sde_sampling_and_likelihood(tmp_path):
    from mdgen_finetune_tpu.data.synthetic import make_synthetic_dataset
    from mdgen_finetune_tpu.data import MDGenDataset
    from mdgen_finetune_tpu.data.featurize import featurize_atom14_batch
    from mdgen_finetune_tpu.inference import InferenceEngine
    from mdgen_finetune_tpu.training import Trainer

    d = str(tmp_path)
    split = make_synthetic_dataset(d, ["AGHK"], num_frames=16)
    cfg = _tiny_cfg(d)
    tr = Trainer(cfg, dtype=jnp.float32)
    ds = MDGenDataset(cfg, split)
    raw = ds.batch(np.random.default_rng(0), 2)
    state = tr.init_state(jax.random.key(0), raw)
    feats = featurize_atom14_batch(jnp.asarray(raw["atom14"]), jnp.asarray(raw["seqres"]), jnp.asarray(raw["mask"]))

    # SDE sampling through the engine (reference Sampler.sample_sde surface)
    eng = InferenceEngine(cfg, state.params, sampler="sde",
                          sde_opts=dict(num_steps=4, last_step="Tweedie", last_step_size=0.04))
    atom14, aa = eng.sample(feats, jax.random.key(1))
    B, T, L = 2, cfg.data.num_frames, cfg.data.crop
    assert atom14.shape == (B, T, L, 14, 3)
    assert np.isfinite(np.asarray(atom14)).all()

    # two keys give different SDE samples (stochastic path)
    atom14b, _ = eng.sample(feats, jax.random.key(2))
    assert not np.allclose(np.asarray(atom14), np.asarray(atom14b))

    # likelihood of ground-truth latents is finite and per-sample
    ll = eng.log_likelihood(feats, jax.random.key(3), num_steps=4)
    assert ll.shape == (B,)
    assert np.isfinite(np.asarray(ll)).all()

    with pytest.raises(ValueError):
        InferenceEngine(cfg, state.params, sampler="bogus")
