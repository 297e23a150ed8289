from .estimator import log_evidence_from_knn, log_evidence_from_knn_np
from .knn import exact_knn, knn_select_xla, refine_knn_f64
from .whiten import WhitenStats, apply_whiten, covariance, whiten_stats
