from .clustered import ClusteredCorpus
from .search import Corpus, matmul, topk
from .arrow_ops import matmul_arrow, topk_arrow

__all__ = ["ClusteredCorpus", "Corpus", "matmul", "matmul_arrow", "topk", "topk_arrow"]
