"""Pallas TPU kernel: fused matmul -> metric epilogue -> blockwise top-k.

This is the TPU-native replacement for the reference's three separate passes
(faer GEMM src/metrics.rs:40-255, dense metric epilogue src/metrics.rs:258-365,
per-row quickselect src/topk.rs:6-75).  Instead of materializing the full
(n_queries, n_corpus) score matrix in HBM — the reference's memory high-water
mark (SURVEY.md §3.1) — the corpus is streamed tile-by-tile through VMEM and a
per-query running top-k carry lives in VMEM scratch across grid steps.

Algorithm (per query-block i):
  for each corpus tile j (grid minor axis, sequential on TPU):
    d  = Q_i @ C_j^T                  on the MXU, f32 accumulation
    s  = metric epilogue(d)           on the VPU (see below)
    carry = top_k(concat([carry, s])) iterative masked-argmax, k steps
  emit carry -> (vals, idx) output block

Metric epilogues operate on a "maximize" orientation so one carry works for
all metrics:
  dot:       s = d
  cosine:    s = d * qinv_i * cinv_j  (inverse norms precomputed per shard;
             zero-norm rows get qinv = 0 so the score is exactly 0.0,
             matching reference metrics.rs:275-289)
  euclidean: s = 2 d - |q_i|^2 - |c_j|^2   (negated *squared* distance;
             sqrt is monotonic so selection is done pre-sqrt and the final
             distance sqrt(max(0, -s)) is applied once on the (M, k) result,
             matching reference metrics.rs:302-307 up to rounding)

Tie-breaking is lowest-corpus-index-wins, identical to jax.lax.top_k
(SURVEY.md §7 hard part #1: the contract the reference's unstable quickselect
never pinned down).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SearchConfig, resolve
from ..ops.metrics import Metric, cosine_eps
from ..ops import reference

_NEG_INF = float("-inf")
_BIG_I32 = jnp.iinfo(jnp.int32).max

_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(
    q_ref,      # (TM, D)    queries tile
    c_ref,      # (TN, D)    corpus tile
    qa_ref,     # (TM, 1)    per-query aux (inv-norm or sq-norm)
    ca_ref,     # (1, TN)    per-corpus aux
    vals_ref,   # (TM, KP)   output: top-k scores (maximize orientation)
    idx_ref,    # (TM, KP)   output: top-k corpus indices
    carry_vals, # (TM, KP)   scratch
    carry_idx,  # (TM, KP)   scratch
    *,
    k: int,
    kp: int,
    block_n: int,
    n_corpus: int,
    metric: Metric,
    precision: jax.lax.Precision,
):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    tm = q_ref.shape[0]

    # Reset the carry at the first corpus tile of each query block.
    @pl.when(j == 0)
    def _():
        carry_vals[:] = jnp.full((tm, kp), _NEG_INF, dtype=jnp.float32)
        carry_idx[:] = jnp.full((tm, kp), _BIG_I32, dtype=jnp.int32)

    # --- MXU: raw dot products for this tile --------------------------------
    d = jax.lax.dot_general(
        q_ref[:],
        c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32,
    )

    # --- VPU: metric epilogue (maximize orientation) ------------------------
    if metric is Metric.DOT:
        s = d
    elif metric is Metric.COSINE:
        s = d * qa_ref[:] * ca_ref[:]
    else:  # EUCLIDEAN: negated squared distance
        s = 2.0 * d - qa_ref[:] - ca_ref[:]

    # Mask out-of-range corpus rows (padding tail of the last tile).
    col = jax.lax.broadcasted_iota(jnp.int32, (tm, block_n), 1)
    s = jnp.where(col + j * block_n < n_corpus, s, _NEG_INF)

    # --- blockwise top-k merge: carry <- top_k([carry, s]) ------------------
    # Iterative extraction, one winner per step.  The carry (KP lanes) and
    # the fresh tile scores (TN lanes) are kept separate: per step, argmax
    # each side, pick the better, mask it in its source.  Tie-breaking is
    # lowest-global-index-wins for free:
    #  - argmax returns the FIRST (lowest-lane) maximum; tile lanes are in
    #    index order, and carry entries with equal values were extracted
    #    lowest-index-first on an earlier step (induction);
    #  - on a carry-vs-tile tie the carry wins (>=), and every carry index
    #    is from an earlier corpus tile, hence smaller.
    cv = carry_vals[:]                                        # (TM, KP)
    ci = carry_idx[:]
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (tm, kp), 1)
    lane_n = col
    n_base = j * block_n
    out_v0 = jnp.full((tm, kp), _NEG_INF, dtype=jnp.float32)
    out_i0 = jnp.full((tm, kp), _BIG_I32, dtype=jnp.int32)

    def extract(t, state):
        cv, s, out_v, out_i = state
        mc = jnp.max(cv, axis=1)                              # (TM,) cheap
        pc = jnp.argmax(cv, axis=1).astype(jnp.int32)
        ms = jnp.max(s, axis=1)                               # full-width
        ps = jnp.argmax(s, axis=1).astype(jnp.int32)          # full-width
        use_c = mc >= ms
        m = jnp.where(use_c, mc, ms)
        hot_c = lane_k == pc[:, None]
        g_c = jnp.sum(jnp.where(hot_c, ci, 0), axis=1)        # cheap gather
        g = jnp.where(use_c, g_c, n_base + ps)
        slot = lane_k == t                                    # one-hot column
        out_v = jnp.where(slot, m[:, None], out_v)
        out_i = jnp.where(slot, g[:, None], out_i)
        cv = jnp.where(use_c[:, None] & hot_c, _NEG_INF, cv)  # cheap
        s = jnp.where(
            (~use_c)[:, None] & (lane_n == ps[:, None]), _NEG_INF, s
        )                                                     # full-width
        return cv, s, out_v, out_i

    # Small k unrolls (fastest); larger k uses fori_loop — Mosaic allocates
    # fresh stack VMEM per unrolled step, so a k=100 unroll blows the 16 MB
    # scoped-vmem limit while the rolled loop keeps constant footprint.
    state = (cv, s, out_v0, out_i0)
    if k <= 16:
        for t in range(k):
            state = extract(t, state)
    else:
        state = jax.lax.fori_loop(0, k, extract, state)
    _, _, new_v, new_i = state
    carry_vals[:] = new_v
    carry_idx[:] = new_i

    # Emit on the last corpus tile.
    @pl.when(j == n_j - 1)
    def _():
        vals_ref[:] = carry_vals[:]
        idx_ref[:] = carry_idx[:]


def _pick_block_n(dim: int, block_q: int, block_n: int, kp: int) -> int:
    """Shrink the corpus tile until the working set fits comfortably in VMEM."""
    budget = 10 * 1024 * 1024  # leave headroom out of ~16 MB
    bn = block_n
    while bn > 128:
        tile_bytes = (
            block_q * dim * 4          # Q tile
            + bn * dim * 4 * 2         # C tile (double-buffered)
            + block_q * bn * 4         # dot tile
            + block_q * (kp + bn) * 8  # merge candidates (vals + idx)
            + block_q * kp * 8         # carry
        )
        if tile_bytes <= budget:
            break
        bn //= 2
    return max(bn, 128)


def supports(q_shape, c_shape, dtype, k: int, cfg: SearchConfig) -> bool:
    """Whether the Pallas kernel handles this problem (else XLA fallback)."""
    if jnp.dtype(dtype) != jnp.float32:
        return False  # MXU kernel is f32; f64 path uses lax.top_k fallback
    if k > cfg.k_pad:
        return False
    dim = q_shape[1]
    if dim > 8192:
        return False
    return True


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "block_q", "block_n", "k_pad",
                     "precision", "interpret"),
)
def _fused_topk_f32(
    q: jax.Array,
    c: jax.Array,
    qa: jax.Array,
    ca: jax.Array,
    *,
    k: int,
    metric: Metric,
    block_q: int,
    block_n: int,
    k_pad: int,
    precision: str,
    interpret: bool,
) -> Tuple[jax.Array, jax.Array]:
    m, dim = q.shape
    n = c.shape[0]

    tm = min(block_q, _round_up(m, 8))
    tn = _pick_block_n(_round_up(dim, 128), tm, block_n, k_pad)

    mp = _round_up(m, tm)
    np_ = _round_up(n, tn)
    dp = _round_up(dim, 128)

    qp = jnp.pad(q, ((0, mp - m), (0, dp - dim)))
    cp = jnp.pad(c, ((0, np_ - n), (0, dp - dim)))
    qap = jnp.pad(qa.reshape(m, 1), ((0, mp - m), (0, 0)))
    cap = jnp.pad(ca.reshape(1, n), ((0, 0), (0, np_ - n)))

    grid = (mp // tm, np_ // tn)

    kernel = functools.partial(
        _kernel,
        k=k,
        kp=k_pad,
        block_n=tn,
        n_corpus=n,
        metric=metric,
        precision=_PRECISION[precision],
    )

    flops = 2 * mp * np_ * dp
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, dp), lambda i, j: (i, 0)),
            pl.BlockSpec((tn, dp), lambda i, j: (j, 0)),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, tn), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((tm, k_pad), lambda i, j: (i, 0)),
            pl.BlockSpec((tm, k_pad), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((mp, k_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tm, k_pad), jnp.float32),
            pltpu.VMEM((tm, k_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(mp * dp + np_ * dp + mp * k_pad * 2) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qp, cp, qap, cap)

    return vals[:m, :k], idx[:m, :k]


def _aux_vectors(q, c, metric: Metric):
    """Per-row auxiliary vectors consumed by the kernel epilogue."""
    if metric is Metric.COSINE:
        eps = cosine_eps(q.dtype)
        qn = jnp.sqrt(jnp.sum(q * q, axis=1))
        cn = jnp.sqrt(jnp.sum(c * c, axis=1))
        qa = jnp.where(qn > eps, 1.0 / qn, 0.0)
        ca = jnp.where(cn > eps, 1.0 / cn, 0.0)
    elif metric is Metric.EUCLIDEAN:
        qa = jnp.sum(q * q, axis=1)
        ca = jnp.sum(c * c, axis=1)
    else:
        qa = jnp.zeros((q.shape[0],), q.dtype)
        ca = jnp.zeros((c.shape[0],), c.dtype)
    return qa, ca


def fused_topk(
    q: jax.Array,
    c: jax.Array,
    k: int,
    metric=Metric.COSINE,
    *,
    config: Optional[SearchConfig] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused top-k search. Returns ((m, k) scores best-first, (m, k) indices).

    Dispatches to the Pallas kernel when supported, otherwise to the pure-XLA
    reference path.  ``k`` must already be clamped to ``c.shape[0]``.
    """
    cfg = resolve(config)
    metric = Metric.parse(metric)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if not cfg.use_pallas or not supports(q.shape, c.shape, q.dtype, k, cfg):
        return reference.topk_search(
            q, c, k, metric, precision=cfg.precision
        )

    qa, ca = _aux_vectors(q, c, metric)
    # Trace the Pallas kernel with x64 disabled: the kernel is pure
    # f32/int32, and under jax_enable_x64 bare Python int literals (e.g. in
    # BlockSpec index maps) become i64 scalars that Mosaic cannot lower.
    with jax.enable_x64(False):
        vals, idx = _fused_topk_f32(
            q, c, qa, ca,
            k=k,
            metric=metric,
            block_q=cfg.block_q,
            block_n=cfg.block_n,
            k_pad=cfg.k_pad,
            precision=cfg.precision,
            interpret=interpret,
        )
    if metric is Metric.EUCLIDEAN:
        vals = jnp.sqrt(jnp.maximum(-vals, 0.0))
    return vals, idx
