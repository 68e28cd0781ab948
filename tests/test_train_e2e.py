"""End-to-end: synthetic data -> training (loss drops) -> sampling/rollout."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdgen_finetune_tpu.config import (
    DataConfig,
    MDGenConfig,
    ModelConfig,
    TaskConfig,
    TrainConfig,
    TransportConfig,
)
from mdgen_finetune_tpu.data import MDGenDataset, make_batch_iterator
from mdgen_finetune_tpu.data.featurize import featurize_atom14_batch
from mdgen_finetune_tpu.data.synthetic import make_synthetic_dataset
from mdgen_finetune_tpu.inference import InferenceEngine
from mdgen_finetune_tpu.parallel.mesh import make_mesh
from mdgen_finetune_tpu.tasks import prep_batch
from mdgen_finetune_tpu.training import Trainer


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    make_synthetic_dataset(str(d), ["AAAA", "GHKL"], num_frames=64)
    return str(d)


def tiny_cfg(data_dir, **task_kw):
    return MDGenConfig(
        model=ModelConfig(
            num_layers=2, embed_dim=32, mha_heads=4, ipa_heads=2, ipa_head_dim=8,
            ipa_qk=4, ipa_v=4, prepend_ipa=True, abs_pos_emb=True, use_bf16=False,
        ),
        transport=TransportConfig(sampling_method="euler", inference_steps=8),
        data=DataConfig(data_dir=data_dir, num_frames=8, crop=4),
        task=TaskConfig(sim_condition=True, **task_kw) if "tps_condition" not in task_kw else TaskConfig(**task_kw),
        train=TrainConfig(batch_size=2, lr=3e-3, ema=True, ema_decay=0.9, dp_size=1, sp_size=1),
    )


def test_prep_batch_semantics(data_dir):
    cfg = tiny_cfg(data_dir)
    ds = MDGenDataset(cfg, f"{data_dir}/split.csv")
    batch = ds.batch(np.random.default_rng(0), 2)
    feats = featurize_atom14_batch(
        jnp.asarray(batch["atom14"]), jnp.asarray(batch["seqres"]), jnp.asarray(batch["mask"])
    )
    prep = prep_batch(cfg, feats)
    B, T, L = 2, 8, 4
    assert prep["latents"].shape == (B, T, L, 21)
    # frame-0 offsets are identity: quat (1,0,0,0), zero translation
    off0 = np.asarray(prep["latents"][:, 0, :, :7])
    np.testing.assert_allclose(off0[..., 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(off0[..., 1:], 0.0, atol=1e-4)
    # quats canonicalized to non-negative real part everywhere
    assert (np.asarray(prep["latents"][..., 0]) >= -1e-6).all()
    # sim conditioning: frame 0 only
    cm = np.asarray(prep["model_kwargs"]["x_cond_mask"])
    assert cm[:, 0].all() and (cm[:, 1:] == 0).all()
    # x_cond zeroed off-conditioning
    xc = np.asarray(prep["model_kwargs"]["x_cond"])
    assert (xc[:, 1:] == 0).all() and np.abs(xc[:, 0]).sum() > 0


def test_overfit_and_sample(data_dir):
    cfg = tiny_cfg(data_dir).replace(
        data=DataConfig(data_dir=data_dir, num_frames=8, crop=4, overfit=True, overfit_frame=True)
    )
    trainer = Trainer(cfg)
    ds = MDGenDataset(cfg, f"{data_dir}/split.csv")
    it = make_batch_iterator(ds, cfg.train.batch_size, seed=0)
    state = trainer.init_state(jax.random.key(0), next(it))

    losses = []
    state = trainer.fit(
        state, it, num_steps=60, rng=jax.random.key(1), log_every=10, log_fn=lambda m: losses.append(m["loss"])
    )
    assert losses[-1] < losses[0] * 0.7, f"loss did not drop: {losses}"

    engine = InferenceEngine(cfg, state.ema_params, dtype=jnp.float32)
    batch = ds.batch(np.random.default_rng(1), 2)
    feats = featurize_atom14_batch(
        jnp.asarray(batch["atom14"]), jnp.asarray(batch["seqres"]), jnp.asarray(batch["mask"])
    )
    atom14, aa_out = engine.sample(feats, jax.random.key(2))
    assert atom14.shape == (2, 8, 4, 14, 3)
    assert np.isfinite(np.asarray(atom14)).all()

    # autoregressive rollout: 2 windows
    traj = engine.rollout(batch["atom14"][:, 0], batch["seqres"], batch["mask"], num_rollouts=2, key=jax.random.key(3))
    assert traj.shape == (2, 16, 4, 14, 3)
    assert np.isfinite(traj).all()


def test_train_step_dp_mesh(data_dir):
    """Data-parallel training on the virtual 8-device CPU mesh."""
    cfg = tiny_cfg(data_dir).replace(train=TrainConfig(batch_size=8, lr=1e-3, dp_size=8, sp_size=1))
    mesh = make_mesh(8, 1)
    trainer = Trainer(cfg, mesh=mesh)
    ds = MDGenDataset(cfg, f"{data_dir}/split.csv")
    it = make_batch_iterator(ds, 8, seed=0)
    state = trainer.init_state(jax.random.key(0), next(it))
    for _ in range(2):
        from mdgen_finetune_tpu.parallel.mesh import shard_batch

        state, metrics = trainer.train_step(state, shard_batch(mesh, next(it)), jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))


def test_checkpoint_roundtrip(data_dir, tmp_path):
    cfg = tiny_cfg(data_dir)
    trainer = Trainer(cfg)
    ds = MDGenDataset(cfg, f"{data_dir}/split.csv")
    it = make_batch_iterator(ds, 2, seed=0)
    state = trainer.init_state(jax.random.key(0), next(it))
    path = trainer.save_checkpoint(state, str(tmp_path / "ckpt"))
    restored = trainer.restore_checkpoint(path, state)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multihost_metric_averaging_with_mocked_process_count(data_dir, monkeypatch):
    """The jax.process_count() > 1 branch in Trainer.fit (reference
    all_gather_object of log dicts, src/mdgen/wrapper.py:22-28) — exercised
    by mocking a 2-process world whose allgather stacks per-host scalars."""
    cfg = tiny_cfg(data_dir)
    trainer = Trainer(cfg)
    ds = MDGenDataset(cfg, f"{data_dir}/split.csv")
    it = make_batch_iterator(ds, 2, seed=0)
    state = trainer.init_state(jax.random.key(0), next(it))

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    from jax.experimental import multihost_utils

    def fake_allgather(metrics):
        # host 0 carries the real value, host 1 a copy + 1.0
        return {k: np.stack([np.asarray(v), np.asarray(v) + 1.0]) for k, v in metrics.items()}

    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)

    logged = []
    trainer.fit(state, it, num_steps=1, rng=jax.random.key(1), log_every=1,
                log_fn=logged.append)
    assert len(logged) == 1
    m = logged[0]
    # every scalar is the cross-host mean => real value + 0.5
    assert np.isfinite(m["loss"]) and m["loss"] > 0
    # re-run single-host with the same batch stream for the ground truth
    it2 = make_batch_iterator(ds, 2, seed=0)
    state2 = trainer.init_state(jax.random.key(0), next(it2))
    monkeypatch.setattr(jax, "process_count", lambda: 1)
    logged2 = []
    trainer.fit(state2, it2, num_steps=1, rng=jax.random.key(1), log_every=1,
                log_fn=logged2.append)
    np.testing.assert_allclose(m["loss"], logged2[0]["loss"] + 0.5, rtol=1e-5)
