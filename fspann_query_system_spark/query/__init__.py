from .exact import knn_exact, knn_exact_crossjoin
from .ann import AnnIndex, search_batch
from .metrics import recall_at_k, distance_ratio_at_k, evaluate

__all__ = [
    "knn_exact", "knn_exact_crossjoin",
    "AnnIndex", "search_batch",
    "recall_at_k", "distance_ratio_at_k", "evaluate",
]
