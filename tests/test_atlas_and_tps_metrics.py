"""ATLAS dataset handling (replicas, crop/pad) and TPS ensemble metrics."""
import os

import numpy as np
import pytest

from mdgen_finetune_tpu.analysis import analyze_tps_ensemble, analyze_tps_replica_sweep
from mdgen_finetune_tpu.cli.msm_common import build_msm_metadata, pick_flux_states
from mdgen_finetune_tpu.config import DataConfig, MDGenConfig
from mdgen_finetune_tpu.data import MDGenDataset
from mdgen_finetune_tpu.data.synthetic import synthesize_trajectory
from mdgen_finetune_tpu.geometry.tables import str_sequence_to_aatype


def test_atlas_dataset_replicas_and_crop(tmp_path):
    d = str(tmp_path)
    seq = "AGHKLMNP"  # L=8
    for r in (1, 2, 3):
        np.save(os.path.join(d, f"PEP_R{r}.npy"), synthesize_trajectory(seq, 40, seed=r))
    with open(os.path.join(d, "split.csv"), "w") as f:
        f.write(f"name,seqres\nPEP,{seq}\n")

    cfg = MDGenConfig(data=DataConfig(data_dir=d, num_frames=8, crop=4, atlas=True))
    ds = MDGenDataset(cfg, os.path.join(d, "split.csv"))
    s = ds.sample(np.random.default_rng(0))
    assert s["atom14"].shape == (8, 4, 14, 3)  # cropped to 4
    assert s["name"].startswith("PEP_R")

    # pad case: crop 12 > L=8
    cfg = MDGenConfig(data=DataConfig(data_dir=d, num_frames=8, crop=12, atlas=True))
    ds = MDGenDataset(cfg, os.path.join(d, "split.csv"))
    s = ds.sample(np.random.default_rng(1))
    assert s["atom14"].shape == (8, 12, 14, 3)
    assert (s["mask"][:8] == 1).all() and (s["mask"][8:] == 0).all()
    assert np.all(s["atom14"][:, 8:] == 0)


def test_tps_ensemble_metrics(tmp_path):
    seq = "AGHK"
    aat = str_sequence_to_aatype(seq)
    md = synthesize_trajectory(seq, 800, seed=0).astype(np.float32)
    path = os.path.join(str(tmp_path), "AGHK.npy")
    np.save(path, md)
    meta = build_msm_metadata(path, aat, os.path.join(str(tmp_path), "meta.pkl"),
                              tica_lag=50, msm_lag=20, n_meta=4)
    assert meta is not None
    start, end = pick_flux_states(meta["cmsm"], "min")
    # generated "transition paths": windows of the MD itself
    gen = [md[i : i + 60] for i in range(0, 300, 100)]
    out = analyze_tps_ensemble(gen, aat, meta, start, end, stride=10, n_ref_samples=50)
    for k in ("gen_prob", "gen_valid_rate", "gen_JSD"):
        assert np.isfinite(out[k]), (k, out[k])
    assert 0 <= out["gen_valid_rate"] <= 1
    assert abs(out["gen_stateprobs"].sum() - 1) < 1e-6


def test_tps_replica_baseline_sweep(tmp_path):
    """Replica-baseline sweep (reference analyze_peptide_tps.py:86-135):
    a full-budget replica that IS the reference MD must produce valid bridge
    paths between its own endpoint states; a frozen replica (no transitions)
    must hit the missing-endpoint zero branch (prob 0, JSD 1)."""
    seq = "AGHK"
    aat = str_sequence_to_aatype(seq)
    md = synthesize_trajectory(seq, 800, seed=0).astype(np.float32)
    path = os.path.join(str(tmp_path), "AGHK.npy")
    np.save(path, md)
    meta = build_msm_metadata(path, aat, os.path.join(str(tmp_path), "meta.pkl"),
                              tica_lag=50, msm_lag=20, n_meta=4)
    start, end = pick_flux_states(meta["cmsm"], "min")
    ref_probs = np.full(4, 0.25)

    out = analyze_tps_replica_sweep(md, aat, meta, start, end, ref_probs,
                                    rep_fracs=(1.0, 0.05), rep_names=("100ns", "5ns"),
                                    msm_lag=20, n_samples=50)
    for nm in ("100ns", "5ns"):
        for suf in ("_rep_prob", "_rep_valid_prob", "_rep_valid_rate", "_rep_JSD"):
            assert np.isfinite(out[nm + suf]), (nm + suf, out)
    # the full replica is the reference MD itself: its MSM contains both
    # endpoint states and bridge paths between them exist
    assert out["100ns_rep_valid_rate"] > 0
    assert out["100ns_rep_JSD"] < 1

    frozen = np.repeat(md[:1], 200, axis=0)
    out0 = analyze_tps_replica_sweep(frozen, aat, meta, start, end, ref_probs,
                                     rep_fracs=(1.0,), rep_names=("100ns",),
                                     msm_lag=20, n_samples=50)
    assert out0["100ns_rep_prob"] == 0.0
    assert out0["100ns_rep_valid_rate"] == 0.0
    assert out0["100ns_rep_JSD"] == 1.0
