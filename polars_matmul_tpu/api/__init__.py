from .search import Corpus, matmul, topk
from .arrow_ops import matmul_arrow, topk_arrow

__all__ = ["Corpus", "matmul", "matmul_arrow", "topk", "topk_arrow"]
