"""Analysis stack: acovf, TICA, k-means, reversible MSM, PCCA+, TP sampling."""
import numpy as np

from mdgen_finetune_tpu.analysis import (
    KMeans,
    MarkovStateModel,
    TICA,
    acovf,
    analyze_sim,
    featurize_trajectory,
    get_state_probs,
    get_tp_likelihood,
    sample_tp,
)
from mdgen_finetune_tpu.data.synthetic import synthesize_trajectory


def test_acovf_matches_naive():
    rng = np.random.default_rng(0)
    x = rng.normal(size=500)
    ac = acovf(x, nlag=20, adjusted=True, demean=False)
    n = len(x)
    for lag in [0, 1, 5, 20]:
        naive = np.sum(x[: n - lag] * x[lag:]) / (n - lag)
        np.testing.assert_allclose(ac[lag], naive, rtol=1e-10)


def test_tica_finds_slow_mode():
    # 2D process: dim 0 slow OU, dim 1 fast noise
    rng = np.random.default_rng(1)
    n = 20000
    slow = np.zeros(n)
    for t in range(1, n):
        slow[t] = 0.999 * slow[t - 1] + 0.05 * rng.normal()
    fast = rng.normal(size=n)
    X = np.stack([fast, slow], axis=1)  # slow mode NOT first
    tica = TICA(lag=100).fit(X)
    y = tica.transform(X)
    # leading TIC should be dominated by the slow coordinate
    corr = abs(np.corrcoef(y[:, 0], slow)[0, 1])
    assert corr > 0.95, corr


def test_kmeans_separates_blobs():
    rng = np.random.default_rng(2)
    X = np.concatenate([rng.normal(-5, 0.3, (200, 2)), rng.normal(5, 0.3, (200, 2))])
    km = KMeans(k=2, seed=137).fit(X)
    a = km.transform(X)
    assert (a[:200] == a[0]).all() and (a[200:] == a[200]).all() and a[0] != a[200]


def _two_well_dtraj(n=200000, p_switch=0.01, seed=3):
    rng = np.random.default_rng(seed)
    states = np.zeros(n, dtype=int)
    s = 0
    for t in range(n):
        sub = rng.integers(0, 3)  # 3 microstates per well
        if rng.uniform() < p_switch:
            s = 1 - s
        states[t] = 3 * s + sub
    return states


def test_msm_reversible_and_pcca():
    dtraj = _two_well_dtraj()
    msm = MarkovStateModel(lag=1).fit(dtraj).pcca(2)
    T, pi = msm.transition_matrix, msm.pi
    np.testing.assert_allclose(T.sum(1), 1.0, atol=1e-8)
    # detailed balance
    np.testing.assert_allclose(pi[:, None] * T, (pi[:, None] * T).T, atol=1e-6)
    # PCCA+ groups microstates by well
    assign = msm.metastable_assignments
    assert len(set(assign[:3])) == 1 and len(set(assign[3:6])) == 1
    assert assign[0] != assign[3]


def test_sample_tp_and_likelihood():
    T = np.array([[0.9, 0.1, 0.0], [0.1, 0.8, 0.1], [0.0, 0.1, 0.9]])
    tp = sample_tp(T, 0, 2, traj_len=10, n_samples=5, rng=np.random.default_rng(4))
    assert tp.shape == (5, 10)
    assert (tp[:, 0] == 0).all() and (tp[:, -1] == 2).all()
    probs = get_tp_likelihood(tp, T)
    assert probs.shape == (5, 9) and (probs >= 0).all() and (probs <= 1).all()
    sp = get_state_probs(tp, num_states=3)
    np.testing.assert_allclose(sp.sum(), 1.0)


def test_analyze_sim_pipeline():
    ref = synthesize_trajectory("AGHK", 600, seed=0).astype(np.float32)
    traj = synthesize_trajectory("AGHK", 400, seed=1).astype(np.float32)
    from mdgen_finetune_tpu.geometry.tables import str_sequence_to_aatype

    aatype = str_sequence_to_aatype("AGHK")
    out = analyze_sim(traj, ref, aatype, tica_lag=50, msm_lag=20, no_decorr=False)
    assert "JSD" in out and "TICA-0" in out["JSD"]
    for v in out["JSD"].values():
        assert 0 <= v <= 1
    # same trajectory against itself: JSD ~ 0
    out_same = analyze_sim(ref, ref, aatype, tica_lag=50, no_msm=True, no_decorr=True)
    assert max(out_same["JSD"].values()) < 1e-6
    if "msm_transition_matrix" in out:
        np.testing.assert_allclose(out["msm_transition_matrix"].sum(1), 1.0, atol=1e-6)
