from .metrics import Metric, cosine_eps
from .reference import pairwise_scores, topk_search, topk_from_scores

__all__ = [
    "Metric",
    "cosine_eps",
    "pairwise_scores",
    "topk_search",
    "topk_from_scores",
]
