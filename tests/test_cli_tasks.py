"""Integration: tps / design / upsampling CLIs end-to-end on synthetic data."""
import json
import os

import numpy as np
import pytest

import jax

from mdgen_finetune_tpu.config import (
    DataConfig, MDGenConfig, ModelConfig, TaskConfig, TrainConfig, TransportConfig,
)
from mdgen_finetune_tpu.data import MDGenDataset, make_batch_iterator
from mdgen_finetune_tpu.data.synthetic import make_synthetic_dataset
from mdgen_finetune_tpu.training import Trainer
from mdgen_finetune_tpu.analysis import sequence_recovery


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    data_dir = str(d / "data")
    split = make_synthetic_dataset(data_dir, ["AGHK"], num_frames=300)
    return {"dir": str(d), "data_dir": data_dir, "split": split}


def train_and_save(cfg, env, name, steps=3):
    trainer = Trainer(cfg)
    ds = MDGenDataset(cfg, env["split"])
    it = make_batch_iterator(ds, cfg.train.batch_size, seed=0)
    state = trainer.init_state(jax.random.key(0), next(it))
    state = trainer.fit(state, it, steps, jax.random.key(1), log_every=100)
    path = trainer.save_checkpoint(state, os.path.join(env["dir"], name))
    return path


def base_model(**kw):
    return ModelConfig(
        num_layers=1, embed_dim=32, mha_heads=4, ipa_heads=2, ipa_head_dim=8,
        ipa_qk=4, ipa_v=4, prepend_ipa=True, abs_pos_emb=True, use_bf16=False, **kw
    )


def test_tps_cli(env):
    cfg = MDGenConfig(
        model=base_model(),
        transport=TransportConfig(sampling_method="euler", inference_steps=4),
        data=DataConfig(data_dir=env["data_dir"], num_frames=8, crop=4),
        task=TaskConfig(tps_condition=True),
        train=TrainConfig(batch_size=2, ema=True),
    )
    ckpt = train_and_save(cfg, env, "tps_ckpt")
    from mdgen_finetune_tpu.cli.tps_inference import main

    out_dir = os.path.join(env["dir"], "tps_out")
    main([
        "--sim_ckpt", ckpt, "--data_dir", env["data_dir"], "--split", env["split"],
        "--out_dir", out_dir, "--num_batches", "1", "--batch_size", "2",
    ])
    meta = json.load(open(os.path.join(out_dir, "AGHK_metadata.json")))
    assert len(meta) == 2
    assert os.path.exists(meta[0]["path"])


def test_upsampling_cli(env):
    cfg = MDGenConfig(
        model=base_model(),
        transport=TransportConfig(sampling_method="euler", inference_steps=4),
        data=DataConfig(data_dir=env["data_dir"], num_frames=8, crop=4),
        task=TaskConfig(sim_condition=True, cond_interval=4),
        train=TrainConfig(batch_size=2, ema=True),
    )
    ckpt = train_and_save(cfg, env, "ups_ckpt")
    # coarse trajectory: 6 frames -> 3 windows of 8 fine frames
    coarse = np.load(os.path.join(env["data_dir"], "AGHK.npy"))[::50][:6]
    np.save(os.path.join(env["data_dir"], "AGHK_i50.npy"), coarse)
    from mdgen_finetune_tpu.cli.upsampling_inference import main

    out_dir = os.path.join(env["dir"], "ups_out")
    main([
        "--ckpt", ckpt, "--data_dir", env["data_dir"], "--suffix", "_i50",
        "--split", env["split"], "--out_dir", out_dir,
    ])
    pdb = os.path.join(out_dir, "AGHK.pdb")
    assert os.path.exists(pdb)
    assert open(pdb).read().count("MODEL") == 24  # 3 windows x 8 frames


def test_design_cli(env):
    cfg = MDGenConfig(
        model=base_model(no_aa_emb=True),
        transport=TransportConfig(sampling_method="euler", inference_steps=4),
        data=DataConfig(data_dir=env["data_dir"], num_frames=8, crop=4),
        task=TaskConfig(inpainting=True, design=True, no_torsion=True),
        train=TrainConfig(batch_size=2, ema=True),
    )
    ckpt = train_and_save(cfg, env, "design_ckpt")
    from mdgen_finetune_tpu.cli.design_inference import main

    out_dir = os.path.join(env["dir"], "design_out")
    main([
        "--sim_ckpt", ckpt, "--data_dir", env["data_dir"], "--split", env["split"],
        "--out_dir", out_dir, "--num_batches", "1", "--batch_size", "2",
        "--num_frames", "8", "--random_start_idx",
    ])
    meta = json.load(open(os.path.join(out_dir, "AGHK_metadata.json")))
    assert len(meta) == 2
    aa = np.array([m["aa_out"] for m in meta])
    assert aa.shape[-1] == 4  # (N, T, L) or (N, L) sequences over 4 residues

    rec = sequence_recovery(np.array([m["aa_out"] for m in meta])[:, 0], np.array([0, 5, 6, 8]))
    assert set(rec) >= {"design_recovery", "cond_recovery", "max_design_recovery"}


def test_analyze_tps_cli(env):
    """tps_inference output -> analyze_tps CLI -> validity/JSD metrics."""
    out_dir = os.path.join(env["dir"], "tps_out")  # produced by test_tps_cli
    if not os.path.exists(os.path.join(out_dir, "AGHK_metadata.json")):
        pytest.skip("tps output fixture missing (test ordering)")
    from mdgen_finetune_tpu.cli.analyze_tps import main

    res_dir = os.path.join(env["dir"], "tps_analysis")
    main(["--pdbdir", out_dir, "--outdir", res_dir, "--save"])
    import pickle

    with open(os.path.join(res_dir, "AGHK.pkl"), "rb") as f:
        res = pickle.load(f)
    assert {"gen_prob", "gen_valid_rate", "gen_JSD"} <= set(res)
    assert 0 <= res["gen_valid_rate"] <= 1


def test_analyze_design_cli(env, capsys):
    out_dir = os.path.join(env["dir"], "design_out")  # produced by test_design_cli
    if not os.path.exists(os.path.join(out_dir, "AGHK_metadata.json")):
        pytest.skip("design output fixture missing (test ordering)")
    from mdgen_finetune_tpu.cli.analyze_design import main

    main(["--pdbdir", out_dir])
    out = capsys.readouterr().out
    assert "design_recovery" in out and "MEAN" in out


def test_analyze_upsampling_cli(env):
    out_dir = os.path.join(env["dir"], "ups_out")  # produced by test_upsampling_cli
    if not os.path.exists(os.path.join(out_dir, "AGHK.pdb")):
        pytest.skip("upsampling output fixture missing (test ordering)")
    from mdgen_finetune_tpu.cli.analyze_upsampling import main

    main(["--mddir", env["data_dir"], "--pdbdir", out_dir])
    import pickle

    with open(os.path.join(out_dir, "AGHK_autocorr.pkl"), "rb") as f:
        res = pickle.load(f)
    assert set(res) == {"md_autocorr", "our_autocorr", "subsample_autocorr"}
