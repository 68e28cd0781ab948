"""Full peptide-simulation analysis pipeline (reference
src/scripts/analyze_peptide_sim.py:29-206 'main', minus matplotlib plots).

Given a generated trajectory and a reference MD trajectory (atom14 arrays),
produces the same summary dict: per-torsion + TICA JSDs, decorrelation curves,
and MSM metastable statistics (probs, transition matrices, stationary pi).
"""
from __future__ import annotations

import numpy as np

from .cluster import KMeans
from .featurize import featurize_trajectory
from .metrics import decorrelation, tica_jsd, torsion_jsd
from .msm import MarkovStateModel
from .tica import TICA


def analyze_sim(
    traj_atom14: np.ndarray,
    ref_atom14: np.ndarray,
    aatype: np.ndarray,
    *,
    tica_lag: int = 1000,
    msm_lag: int = 1000,
    traj_msm_lag: int = 10,
    n_meta: int = 10,
    no_decorr: bool = False,
    no_msm: bool = False,
    seed: int = 137,
) -> dict:
    out = {}
    labels, traj = featurize_trajectory(traj_atom14, aatype, sidechains=True, cossin=False)
    _, ref = featurize_trajectory(ref_atom14, aatype, sidechains=True, cossin=False)
    out["features"] = labels
    out["JSD"] = torsion_jsd(ref, traj, labels)

    if not no_decorr:
        out["md_decorrelation"] = decorrelation(ref, labels, nlag=100_000)
        out["our_decorrelation"] = decorrelation(traj, labels, nlag=1000)

    # TICA on cossin features, fit on the reference MD
    _, traj_cs = featurize_trajectory(traj_atom14, aatype, sidechains=True, cossin=True)
    _, ref_cs = featurize_trajectory(ref_atom14, aatype, sidechains=True, cossin=True)
    tica = TICA(lag=tica_lag).fit(ref_cs)
    ref_tica, traj_tica = tica.transform(ref_cs), tica.transform(traj_cs)
    out["JSD"].update(tica_jsd(ref_tica, traj_tica))

    if not no_decorr:
        from .metrics import acovf

        out["md_decorrelation"]["tica"] = acovf(ref_tica[:, 0], nlag=100_000).astype(np.float16)
        out["our_decorrelation"]["tica"] = acovf(traj_tica[:, 0], nlag=1000).astype(np.float16)

    if not no_msm:
        try:
            kmeans = KMeans(k=100, max_iter=100, seed=seed).fit(ref_tica)
            ref_kmeans = kmeans.transform(ref_tica)
            msm = MarkovStateModel(lag=msm_lag).fit(ref_kmeans, n_states=100).pcca(n_meta)
            cmsm = MarkovStateModel(lag=msm_lag).fit(msm.metastable_assignments[ref_kmeans], n_states=n_meta)

            traj_discrete = msm.metastable_assignments[kmeans.transform(traj_tica)]
            ref_discrete = msm.metastable_assignments[ref_kmeans]
            out["traj_metastable_probs"] = (traj_discrete == np.arange(n_meta)[:, None]).mean(1)
            out["ref_metastable_probs"] = (ref_discrete == np.arange(n_meta)[:, None]).mean(1)

            tmat = np.eye(n_meta)
            for a, i in enumerate(cmsm.active_set):
                for b, j in enumerate(cmsm.active_set):
                    tmat[i, j] = cmsm.transition_matrix[a, b]
            out["msm_transition_matrix"] = tmat
            out["pcca_pi"] = msm.pi_coarse
            msm_pi = np.zeros(n_meta)
            msm_pi[cmsm.active_set] = cmsm.pi
            out["msm_pi"] = msm_pi

            traj_msm = MarkovStateModel(lag=traj_msm_lag).fit(traj_discrete, n_states=n_meta)
            tmat = np.eye(n_meta)
            for a, i in enumerate(traj_msm.active_set):
                for b, j in enumerate(traj_msm.active_set):
                    tmat[i, j] = traj_msm.transition_matrix[a, b]
            out["traj_transition_matrix"] = tmat
            traj_pi = np.zeros(n_meta)
            traj_pi[traj_msm.active_set] = traj_msm.pi
            out["traj_pi"] = traj_pi
        except Exception as e:  # per-peptide robustness, as the reference (line 200)
            out["msm_error"] = repr(e)
    return out
