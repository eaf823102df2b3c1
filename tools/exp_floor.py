"""Round-3: measured selection-floor for the canonical k=10 workload.

VERDICT r02 item 5: the >= 85% MXU target (BASELINE.md:26-28) assumes the
op is matmul-bound, but an exact fused top-k must ALSO run selection on
the VPU — scores never materialize in HBM, so selection reads them from
registers/VMEM and its cost adds to (not hides under) the MXU time
whenever it exceeds the per-tile matmul latency.  This experiment
measures the LOWER BOUND stack empirically, as three nested Pallas
programs on the exact canonical tiling (1000x10000x256d, bq=256,
bn=2048, 4 query blocks x 5 corpus tiles):

  A. matmul+epilogue only: the bf16x3 MXU work + bias + a (tm,1) max
     write — what a selection-free kernel costs.  [the MXU/HBM floor]
  B. A + the minimum any *stack-packed exact* selection pays per score:
     u-transform (3 VPU ops) + group-bit pack (2) + ONE max/min stack
     level (2) over every score, one (tm,128) result write.  [the
     1-level selection floor; k-independent]
  C. the shipped gpop kernel (5 levels at k=10 + in-kernel 10-pop
     finish), via the product path.

floor_ms (B) is what bench.py's fraction_of_selection_floor divides by;
(B - A) / 7 is the measured per-VPU-pass cost over the 10.5M scores;
(C - B) / 8 the per-extra-level cost (4 levels x 2 ops).  If B >> A, no
exact fused top-k on this workload can approach the MXU roofline and the
honest headline is the selection-floor fraction, not MXU MFU.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_floor.py
"""
import functools
import json

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import polars_matmul_tpu  # noqa: F401
from polars_matmul_tpu.config import SearchConfig
from polars_matmul_tpu.kernels.fused_topk import (
    _f32_to_u, _split_hi_lo, fused_topk, prepare_corpus, _LANES)
from polars_matmul_tpu.utils.autotune import device_step_seconds

M, N, DIM, K = 1000, 10_000, 256, 10
TM, TN = 256, 2048


def _kernel_ab(q_ref, c_ref, cb_ref, out_ref, st_ref, *, levels: int):
    """bf16x3 matmul + epilogue (+ ``levels`` stack levels of packed
    selection over every score).  levels=0 is program A, 1 is B."""
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    dsplit = q_ref.shape[1] // 2
    qh, ql = q_ref[:, :dsplit], q_ref[:, dsplit:]
    ch, cl = c_ref[:, :dsplit], c_ref[:, dsplit:]
    p = jax.lax.Precision.DEFAULT
    d = jax.lax.dot_general(qh, ch, (((1,), (1,)), ((), ())), precision=p,
                            preferred_element_type=jnp.float32)
    d = d + (jax.lax.dot_general(qh, cl, (((1,), (1,)), ((), ())),
                                 precision=p,
                                 preferred_element_type=jnp.float32)
             + jax.lax.dot_general(ql, ch, (((1,), (1,)), ((), ())),
                                   precision=p,
                                   preferred_element_type=jnp.float32))
    s = d + cb_ref[:]
    if levels == 0:
        @pl.when(j == 0)
        def _():
            st_ref[0] = jnp.zeros((TM, _LANES), jnp.int32)
        m1 = jnp.max(s, axis=1, keepdims=True)
        st_ref[0] = st_ref[0] + m1.astype(jnp.int32)
    else:
        @pl.when(j == 0)
        def _():
            for i in range(levels):
                st_ref[i] = jnp.full((TM, _LANES), jnp.iinfo(jnp.int32).min,
                                     jnp.int32)
        clean = jnp.int32(~127)
        u = _f32_to_u(jax.lax.bitcast_convert_type(s, jnp.int32))
        st = [st_ref[i] for i in range(levels)]
        base = jnp.int32(79) - j * jnp.int32(TN // _LANES)
        for g in range(TN // _LANES):
            t = (u[:, g * _LANES:(g + 1) * _LANES] & clean) | (base - g)
            for i in range(levels):
                hi = jnp.maximum(st[i], t)
                t = jnp.minimum(st[i], t)
                st[i] = hi
        for i in range(levels):
            st_ref[i] = st[i]

    @pl.when(j == n_j - 1)
    def _():
        out_ref[:] = st_ref[0][:, :_LANES]


def measure_ab(levels: int, q, cp, cbp):
    mp, np_ = 1024, 10_240
    kern = functools.partial(_kernel_ab, levels=levels)
    call = pl.pallas_call(
        kern,
        grid=(mp // TM, np_ // TN),
        in_specs=[
            pl.BlockSpec((TM, 2 * DIM), lambda i, j: (i, 0)),
            pl.BlockSpec((TN, 2 * DIM), lambda i, j: (j, 0)),
            pl.BlockSpec((1, TN), lambda i, j: (0, j)),
        ],
        out_specs=[pl.BlockSpec((TM, _LANES), lambda i, j: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((mp, _LANES), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((max(levels, 1), TM, _LANES),
                                   jnp.int32)],
    )

    def step(qq):
        # the package enables x64 globally; Mosaic cannot lower the i64
        # scalars bare index-map ints become under it (see ARCHITECTURE
        # "Environment quirks") — trace the kernel with x64 off, exactly
        # like fused_topk_prepared does
        with jax.enable_x64(False):
            (o,) = call(qq, cp, cbp)
        return o[:, :1].astype(jnp.float32)

    ts = [device_step_seconds(step, q, chain_lo=8, chain_hi=136, iters=3)
          * 1e3 for _ in range(3)]
    return ts


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(7)
    qf = rng.standard_normal((M, DIM)).astype(np.float32)
    cf = rng.standard_normal((N, DIM)).astype(np.float32)
    cp, cbp = prepare_corpus(jnp.asarray(cf), "cosine", tn=TN,
                             precision="bf16x3")
    cp, cbp = jax.block_until_ready((cp, cbp))
    qn = qf / np.linalg.norm(qf, axis=1, keepdims=True)
    qp = np.zeros((1024, DIM), np.float32)
    qp[:M] = qn
    q = jax.block_until_ready(
        jnp.asarray(np.asarray(_split_hi_lo(jnp.asarray(qp)))))

    a = measure_ab(0, q, cp, cbp)
    print(json.dumps({"program": "A matmul+epilogue", "ms": [round(t, 4)
                      for t in a]}), flush=True)
    b = measure_ab(1, q, cp, cbp)
    print(json.dumps({"program": "B +1-level packed selection",
                      "ms": [round(t, 4) for t in b]}), flush=True)
    b5 = measure_ab(5, q, cp, cbp)
    print(json.dumps({"program": "B5 +5-level packed selection",
                      "ms": [round(t, 4) for t in b5]}), flush=True)

    cq = jnp.asarray(qf)
    cc = jnp.asarray(cf)
    jax.block_until_ready((cq, cc))
    cfg = SearchConfig(selection="gpop")

    def step(qq):
        v, _ = fused_topk(qq, cc, K, "cosine", config=cfg)
        return jnp.max(v, axis=1, keepdims=True)

    c_ms = [device_step_seconds(step, cq, chain_lo=8, chain_hi=136,
                                iters=3) * 1e3 for _ in range(3)]
    print(json.dumps({"program": "C shipped gpop k=10",
                      "ms": [round(t, 4) for t in c_ms]}), flush=True)
    am, bm, b5m, cm = (min(a), min(b), min(b5), min(c_ms))
    print(json.dumps({
        "floor_ms": round(bm, 4),
        "mxu_epilogue_ms": round(am, 4),
        "per_pass_ms": round((bm - am) / 7, 4),
        "per_level_ms": round((b5m - bm) / 8, 4),
        "shipped_ms": round(cm, 4),
        "fraction_of_selection_floor": round(bm / cm, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
