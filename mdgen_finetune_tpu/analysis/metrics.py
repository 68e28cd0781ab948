"""Physics-fidelity metrics: torsion JSD, decorrelation curves.

Ports the acceptance metrics of src/scripts/analyze_peptide_sim.py:44-151
without statsmodels/pyemma: Jensen-Shannon distances of torsion marginals
(100 bins over [-pi, pi]) and 2D pairs, and autocovariance-based
decorrelation of sin/cos torsion observables and TICA components.
"""
from __future__ import annotations

import numpy as np
from scipy.spatial.distance import jensenshannon


def acovf(x: np.ndarray, nlag: int, adjusted: bool = True, demean: bool = False) -> np.ndarray:
    """Autocovariance function via FFT (statsmodels.tsa.stattools.acovf
    semantics for the flags the reference uses)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    nlag = min(nlag, n - 1)
    if demean:
        x = x - x.mean()
    nfft = 1 << int(np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(x, nfft)
    acov = np.fft.irfft(f * np.conjugate(f), nfft)[: nlag + 1].real
    if adjusted:
        acov = acov / (n - np.arange(nlag + 1))
    else:
        acov = acov / n
    return acov


def torsion_jsd(ref_feats: np.ndarray, traj_feats: np.ndarray, labels: list[str]) -> dict:
    """Per-feature JSD (100 bins) + phi/psi 2D pair JSDs (50 bins)
    (src/scripts/analyze_peptide_sim.py:51-60)."""
    out = {}
    for i, lab in enumerate(labels):
        ref_p = np.histogram(ref_feats[:, i], range=(-np.pi, np.pi), bins=100)[0]
        traj_p = np.histogram(traj_feats[:, i], range=(-np.pi, np.pi), bins=100)[0]
        out[lab] = float(jensenshannon(ref_p, traj_p))
    for i in (1, 3):
        if i + 1 >= len(labels):
            continue
        ref_p = np.histogram2d(
            ref_feats[:, i], ref_feats[:, i + 1], range=((-np.pi, np.pi), (-np.pi, np.pi)), bins=50
        )[0]
        traj_p = np.histogram2d(
            traj_feats[:, i], traj_feats[:, i + 1], range=((-np.pi, np.pi), (-np.pi, np.pi)), bins=50
        )[0]
        out["|".join(labels[i : i + 2])] = float(jensenshannon(ref_p.flatten(), traj_p.flatten()))
    return out


def decorrelation(feats: np.ndarray, labels: list[str], nlag: int) -> dict:
    """Normalized sin/cos autocovariance decay per torsion
    (src/scripts/analyze_peptide_sim.py:66-97)."""
    out = {}
    for i, lab in enumerate(labels):
        ac = acovf(np.sin(feats[:, i]), nlag=nlag) + acovf(np.cos(feats[:, i]), nlag=nlag)
        baseline = np.sin(feats[:, i]).mean() ** 2 + np.cos(feats[:, i]).mean() ** 2
        out[lab] = ((ac - baseline) / (1 - baseline)).astype(np.float16)
    return out


def tica_jsd(ref_tica: np.ndarray, traj_tica: np.ndarray) -> dict:
    """TICA-0 and TICA-0,1 JSDs over the joint range
    (src/scripts/analyze_peptide_sim.py:113-125)."""
    lo0 = min(ref_tica[:, 0].min(), traj_tica[:, 0].min())
    hi0 = max(ref_tica[:, 0].max(), traj_tica[:, 0].max())
    lo1 = min(ref_tica[:, 1].min(), traj_tica[:, 1].min())
    hi1 = max(ref_tica[:, 1].max(), traj_tica[:, 1].max())
    ref_p = np.histogram(ref_tica[:, 0], range=(lo0, hi0), bins=100)[0]
    traj_p = np.histogram(traj_tica[:, 0], range=(lo0, hi0), bins=100)[0]
    out = {"TICA-0": float(jensenshannon(ref_p, traj_p))}
    ref_p2 = np.histogram2d(*ref_tica[:, :2].T, range=((lo0, hi0), (lo1, hi1)), bins=50)[0]
    traj_p2 = np.histogram2d(*traj_tica[:, :2].T, range=((lo0, hi0), (lo1, hi1)), bins=50)[0]
    out["TICA-0,1"] = float(jensenshannon(ref_p2.flatten(), traj_p2.flatten()))
    return out
