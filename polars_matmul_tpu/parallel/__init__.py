from .mesh import init_distributed, make_mesh
from .sharded import (
    ShardedCorpus,
    distributed_matmul,
    distributed_topk,
    shard_corpus,
)

__all__ = [
    "ShardedCorpus",
    "distributed_matmul",
    "distributed_topk",
    "init_distributed",
    "make_mesh",
    "shard_corpus",
]
