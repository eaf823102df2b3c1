"""Corpus-sharded distributed search (shard_map + XLA collectives).

The TPU-native answer to the reference's (absent) distributed layer
(SURVEY.md §2.3, §5): the corpus is block-partitioned across the ``corpus``
mesh axis, each device runs the fused Pallas top-k on its shard with global
index offsets, and per-shard k-candidates are merged by a re-select — the
exchange is tiny (k x (idx, score) per shard per query).

Block (contiguous) partitioning is chosen over hash partitioning
deliberately: shard s owns global rows [s*ns, (s+1)*ns), so the gathered
candidate list is ordered by global index and a plain ``lax.top_k`` re-select
preserves the lowest-index-wins tie contract (SURVEY.md §7 hard part #1)
with no extra keying.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import numpy as np

from ..config import SearchConfig, resolve
from ..ops.metrics import Metric
from ..ops.reference import topk_from_scores


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class ShardedCorpus:
    """Device-resident corpus, block-partitioned over the corpus mesh axis.

    ``data`` is zero-padded to a multiple of the shard count; ``n_true`` is
    the real row count (padding rows are masked out of every search).
    """

    data: "jax.Array"  # noqa: F821  (n_padded, dim), sharded over corpus axis
    n_true: int

    @property
    def shape(self):
        return self.data.shape


def shard_corpus(c, mesh, config: Optional[SearchConfig] = None) -> ShardedCorpus:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = resolve(config)
    axis = cfg.mesh_axes[1]
    n_shards = mesh.shape[axis]
    n = c.shape[0]
    n_pad = _round_up(n, n_shards)
    if n_pad != n:
        c = jnp.pad(c, ((0, n_pad - n), (0, 0)))
    sharding = NamedSharding(mesh, P(axis, None))
    return ShardedCorpus(jax.device_put(c, sharding), n)


def _shard_map(fn, mesh, in_specs, out_specs):
    """shard_map across jax versions."""
    import jax

    if hasattr(jax, "shard_map"):
        return jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    from jax.experimental.shard_map import shard_map as sm  # pragma: no cover

    return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
              check_rep=False)


def distributed_topk(
    q,
    corpus: ShardedCorpus,
    k: int,
    metric,
    mesh,
    config: Optional[SearchConfig] = None,
) -> Tuple["jax.Array", "jax.Array"]:  # noqa: F821
    """Top-k over a sharded corpus.

    Phase 1 (shard_map): per-shard fused top-k with global index offsets,
    padding rows masked to worst-score.  Phase 2: gather the (m, S*k_local)
    candidate panels (XLA inserts the all-gather over ICI) and re-select.
    Returns (scores, indices) like the single-device path.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..kernels.fused_topk import fused_topk

    cfg = resolve(config)
    metric = Metric.parse(metric)
    d_axis, c_axis = cfg.mesh_axes
    n_shards = mesh.shape[c_axis]
    n_pad = corpus.shape[0]
    ns = n_pad // n_shards
    n_true = corpus.n_true
    k = min(k, n_true)
    k_local = min(k, ns)
    hib = metric.higher_is_better
    worst = jnp.float32(-np.inf if hib else np.inf)

    def local_fn(q_, c_):
        vals, idx = fused_topk(q_, c_, k_local, metric, config=cfg)
        off = jax.lax.axis_index(c_axis) * ns
        gidx = idx + off
        vals = jnp.where(gidx < n_true, vals, worst)
        return vals, gidx

    shards_data = mesh.shape[d_axis] > 1
    q_spec = P(d_axis, None) if shards_data else P()
    vals_g, idx_g = _shard_map(
        local_fn,
        mesh,
        in_specs=(q_spec, P(c_axis, None)),
        out_specs=(
            P(d_axis if shards_data else None, c_axis),
            P(d_axis if shards_data else None, c_axis),
        ),
    )(q, corpus.data)

    # Phase 2: merge. Candidates are ordered by shard = by global index, so
    # lax.top_k's positional tie-break preserves lowest-index-wins.
    merged_vals, merged_pos = topk_from_scores(vals_g, k, hib)
    merged_idx = jnp.take_along_axis(idx_g, merged_pos, axis=1)
    return merged_vals, merged_idx.astype(jnp.int32)


def distributed_matmul(
    q,
    corpus: ShardedCorpus,
    mesh,
    config: Optional[SearchConfig] = None,
):
    """Dense Q . C^T over a sharded corpus: per-shard panels concatenated
    along the corpus axis (the output IS (m, n), so it is materialized —
    this op exists for parity with the reference's raw matmul)."""
    import jax
    from jax.sharding import PartitionSpec as P

    from ..kernels.matmul import pairwise_matmul

    cfg = resolve(config)
    d_axis, c_axis = cfg.mesh_axes
    shards_data = mesh.shape[d_axis] > 1

    def local_fn(q_, c_):
        return pairwise_matmul(q_, c_, precision=cfg.precision)

    out = _shard_map(
        local_fn,
        mesh,
        in_specs=(P(d_axis, None) if shards_data else P(), P(c_axis, None)),
        out_specs=P(d_axis if shards_data else None, c_axis),
    )(q, corpus.data)
    return out[:, : corpus.n_true]
