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
from .msm import MarkovStateModel, get_state_probs, get_tp_likelihood, sample_tp


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


def analyze_tps_replica_sweep(
    rep_atom14: np.ndarray,
    aatype: np.ndarray,
    meta: dict,
    start_state: int,
    end_state: int,
    ref_stateprobs: np.ndarray,
    rep_fracs: tuple = (1.0, 0.5, 0.3, 0.2, 0.1, 0.05, 0.02),
    rep_names: tuple = ("100ns", "50ns", "30ns", "20ns", "10ns", "5ns", "2ns"),
    msm_lag: int = 1000,
    traj_len: int = 11,
    n_samples: int = 1000,
    seed: int = 137,
) -> dict:
    """The reference's replica-baseline sweep
    (src/scripts/analyze_peptide_tps.py:86-135): score transition paths
    sampled from MSMs estimated on an INDEPENDENT replica MD trajectory
    truncated to shrinking simulation budgets — the baseline the paper's
    "beats X ns of MD" claim rests on. For each budget: discretize the
    truncated replica through the reference pipeline's tica/kmeans/
    metastable map, estimate a fresh MSM (the reference's
    pyemma.msm.estimate_markov_model at lag 1000), bridge-sample
    ``n_samples`` paths between the endpoint states, and score them with
    the SAME likelihood/JSD machinery applied to generated ensembles. When
    either endpoint state is absent from the truncated replica's MSM the
    budget scores zero (validity/prob 0, JSD 1) — exactly the reference's
    branch (analyze_peptide_tps.py:101-110).

    The reference truncates its ~1M-frame 100 ns replica to absolute frame
    counts {999999, 500000, 300000, 200000, 100000, 50000, 20000}; here the
    budgets are the same sweep expressed as FRACTIONS of the replica so the
    sweep also applies to shorter (e.g. synthetic) replicas. msm_lag is
    clipped to len/4 like build_msm_metadata.
    """
    msm, cmsm, tica, kmeans = meta["msm"], meta["cmsm"], meta["tica"], meta["kmeans"]
    rng = np.random.default_rng(seed)
    _, rep_cs = featurize_trajectory(rep_atom14, aatype, sidechains=True, cossin=True)

    active_pos = {int(v): i for i, v in enumerate(cmsm.active_set)}
    highest = int(cmsm.active_set[np.argmax(cmsm.pi)])
    to_active = np.vectorize(lambda s: active_pos.get(int(s), active_pos[highest]))

    out = {}
    for frac, nm in zip(rep_fracs, rep_names):
        n = max(int(round(len(rep_cs) * frac)), 8)
        zero = {f"{nm}_rep_prob": 0.0, f"{nm}_rep_valid_prob": 0.0,
                f"{nm}_rep_valid_rate": 0.0, f"{nm}_rep_JSD": 1.0}
        try:
            rep_discrete = msm.metastable_assignments[
                kmeans.transform(tica.transform(rep_cs[:n]))]
            rep_msm = MarkovStateModel(lag=min(msm_lag, n // 4)).fit(
                rep_discrete, n_states=len(ref_stateprobs))
        except Exception:
            out.update(zero)
            continue
        rep_pos = {int(v): i for i, v in enumerate(rep_msm.active_set)}
        if start_state not in rep_pos or end_state not in rep_pos:
            out.update(zero)
            continue
        repidx_tp = sample_tp(rep_msm.transition_matrix, rep_pos[start_state],
                              rep_pos[end_state], traj_len=traj_len,
                              n_samples=n_samples, rng=rng)
        rep_tp = rep_msm.active_set[repidx_tp]
        rep_probs = get_tp_likelihood(to_active(rep_tp), cmsm.transition_matrix)
        rep_prob = rep_probs.prod(-1)
        rep_stateprobs = get_state_probs(rep_tp, num_states=len(ref_stateprobs))
        out[f"{nm}_rep_prob"] = float(rep_prob.mean())
        out[f"{nm}_rep_valid_prob"] = (
            float(rep_prob[rep_prob > 0].mean()) if (rep_prob > 0).any() else 0.0)
        out[f"{nm}_rep_valid_rate"] = float((rep_prob > 0).mean())
        out[f"{nm}_rep_JSD"] = float(jensenshannon(ref_stateprobs, rep_stateprobs))
    return out


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
