"""Task-specific acceptance metrics: TPS path validity, upsampling
autocorrelation recovery, design sequence recovery.

Ports the metric cores of src/scripts/analyze_peptide_tps.py:63-131,
analyze_upsampling.py:15-36, and analyze_peptide_design.py:25-96 (matplotlib
plotting omitted; pyemma replaced by the native analysis stack).
"""
from __future__ import annotations

import numpy as np
from scipy.spatial.distance import jensenshannon

from .featurize import featurize_trajectory
from .metrics import acovf
from .msm import get_state_probs, get_tp_likelihood, sample_tp


def analyze_tps_ensemble(
    gen_trajs_atom14: list[np.ndarray],
    aatype: np.ndarray,
    meta: dict,
    start_state: int,
    end_state: int,
    stride: int = 10,
    n_ref_samples: int = 1000,
    seed: int = 137,
) -> dict:
    """Validity rate / mean path probability / state-visitation JSD of a
    generated transition-path ensemble vs MSM bridge samples
    (src/scripts/analyze_peptide_tps.py:63-84).

    meta: {"msm", "cmsm", "tica", "kmeans"} from build_msm_metadata.
    """
    msm, cmsm, tica, kmeans = meta["msm"], meta["cmsm"], meta["tica"], meta["kmeans"]
    rng = np.random.default_rng(seed)

    active_pos = {int(v): i for i, v in enumerate(cmsm.active_set)}
    start_a, end_a = active_pos[start_state], active_pos[end_state]

    ref_tp = sample_tp(cmsm.transition_matrix, start_a, end_a, traj_len=11, n_samples=n_ref_samples, rng=rng)
    ref_tp = cmsm.active_set[ref_tp]
    ref_stateprobs = get_state_probs(ref_tp)

    feats = [featurize_trajectory(t, aatype, sidechains=True, cossin=True)[1] for t in gen_trajs_atom14]
    cat = np.concatenate(feats, axis=0)
    gen_discrete = msm.metastable_assignments[kmeans.transform(tica.transform(cat))]
    gen_tp_all = gen_discrete.reshape(len(gen_trajs_atom14), -1)
    gen_tp = np.concatenate([gen_tp_all[:, ::stride], gen_tp_all[:, -1:]], axis=1)
    gen_stateprobs = get_state_probs(gen_tp)

    highest = int(cmsm.active_set[np.argmax(cmsm.pi)])
    to_active = np.vectorize(lambda s: active_pos.get(int(s), active_pos[highest]))
    gen_probs = get_tp_likelihood(to_active(gen_tp), cmsm.transition_matrix)
    gen_prob = gen_probs.prod(-1)

    return {
        "gen_prob": float(gen_prob.mean()),
        "gen_valid_prob": float(gen_prob[gen_prob > 0].mean()) if (gen_prob > 0).any() else 0.0,
        "gen_valid_rate": float((gen_prob > 0).mean()),
        "gen_JSD": float(jensenshannon(ref_stateprobs, gen_stateprobs)),
        "ref_stateprobs": ref_stateprobs,
        "gen_stateprobs": gen_stateprobs,
    }


def analyze_upsampling(
    traj_atom14: np.ndarray, ref_atom14: np.ndarray, aatype: np.ndarray, subsample: int = 100
) -> dict:
    """Sin/cos torsion autocovariance of generated vs full-rate vs subsampled MD
    (src/scripts/analyze_upsampling.py:15-27)."""
    labels, ref = featurize_trajectory(ref_atom14, aatype, sidechains=True, cossin=False)
    _, traj = featurize_trajectory(traj_atom14, aatype, sidechains=True, cossin=False)
    out = {"md_autocorr": {}, "our_autocorr": {}, "subsample_autocorr": {}}
    for i, lab in enumerate(labels):
        nlag_ref = len(ref) - 1
        nlag_traj = len(traj) - 1
        out["md_autocorr"][lab] = acovf(np.sin(ref[:, i]), nlag=nlag_ref) + acovf(np.cos(ref[:, i]), nlag=nlag_ref)
        out["our_autocorr"][lab] = acovf(np.sin(traj[:, i]), nlag=nlag_traj) + acovf(np.cos(traj[:, i]), nlag=nlag_traj)
        sub = ref[::subsample]
        out["subsample_autocorr"][lab] = acovf(np.sin(sub[:, i]), nlag=len(sub) - 1) + acovf(
            np.cos(sub[:, i]), nlag=len(sub) - 1
        )
    return out


def sequence_recovery(pred_seqs: np.ndarray, true_seq: np.ndarray) -> dict:
    """Design recovery rates (src/scripts/analyze_peptide_design.py:33-96):
    per-sample design/cond recovery and mode-aggregated max recovery.
    pred_seqs (N, L) int; true_seq (L,) int; designed residues are 1..L-2.
    """
    pred = np.asarray(pred_seqs)
    true = np.asarray(true_seq)
    rec = pred == true[None, :]
    out = {
        "design_recovery": float(rec[:, 1:-1].mean()),
        "cond_recovery": float(np.concatenate([rec[:, -1], rec[:, 0]]).mean()),
    }
    max_aa = []
    for i in range(pred.shape[1]):
        vals, counts = np.unique(pred[:, i], return_counts=True)
        max_aa.append(vals[np.argmax(counts)])
    max_aa = np.array(max_aa)
    out["max_design_recovery"] = float((true[1:-1] == max_aa[1:-1]).mean())
    out["max_cond_recovery"] = float(((true[0] == max_aa[0]) + (true[-1] == max_aa[-1])) / 2)

    middles = ["".join(map(str, p[1:-1])) for p in pred]
    vals, idx, counts = np.unique(middles, return_index=True, return_counts=True)
    most_freq = pred[idx[np.argmax(counts)]]
    out["most_frequent_middle_recovery"] = float((most_freq == true)[1:-1].mean())
    return out
