from .featurize import featurize_trajectory, feature_labels
from .tica import TICA
from .cluster import KMeans
from .msm import MarkovStateModel, pcca_plus, sample_tp, get_tp_likelihood, get_state_probs
from .metrics import acovf, torsion_jsd, decorrelation, tica_jsd
from .pipeline import analyze_sim
from .task_metrics import (analyze_tps_ensemble, analyze_tps_replica_sweep,
                           analyze_upsampling, sequence_recovery)

__all__ = [
    "featurize_trajectory",
    "feature_labels",
    "TICA",
    "KMeans",
    "MarkovStateModel",
    "pcca_plus",
    "sample_tp",
    "get_tp_likelihood",
    "get_state_probs",
    "acovf",
    "torsion_jsd",
    "decorrelation",
    "tica_jsd",
    "analyze_sim",
    "analyze_tps_ensemble",
    "analyze_tps_replica_sweep",
    "analyze_upsampling",
    "sequence_recovery",
]
