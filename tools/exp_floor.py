"""Measured selection-floor for the canonical workload, per k tier.

VERDICT r02 item 5 origin (k=10), extended round 5 (r04 item 5) to the
k=100 and k=512 tiers and to a persisted artifact bench.py derives its
floor constants from (previously a hardcoded 0.107 valid only at k=10).

The >= 85% MXU target (BASELINE.md:26-28) assumes the op is matmul-bound,
but an exact fused top-k must ALSO run selection on the VPU — scores
never materialize in HBM, so selection reads them from registers/VMEM
and its cost adds to (not hides under) the MXU time whenever it exceeds
the per-tile matmul latency.  This experiment measures the LOWER BOUND
stack empirically as nested Pallas programs on the exact tiling each
shipped k tier uses (1000x10000x256d; k<=16 runs bq=256/bn=2048,
k>16 retiles to bq=128/bn=4096):

  A.  matmul+epilogue only: the bf16x3 MXU work + bias + a (tm,1) max
      write — what a selection-free kernel costs.  [the MXU floor]
  B1. A + the minimum any *stack-packed exact* selection pays per score:
      u-transform (3 VPU ops) + group-bit pack (2) + ONE max/min stack
      level (2) over every score.  [the 1-level selection floor — the
      k <= 128 floor: one level is the structural minimum]
  B4. A + FOUR levels: the k=512 structural floor — pigeonhole says any
      128-cell-parallel exact selection must retain >= ceil(k/128) = 4
      candidates per cell.
  C.  the shipped paths (gpop k=10, gstack k=100/k=512), product config.

Floors land in tools/floors.json keyed by device_kind; bench.py reads
that file (fraction_of_selection_floor per tier) so the constants carry
their provenance and go stale loudly (device-kind mismatch -> omitted),
not silently.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_floor.py
"""
import functools
import json
import os

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

M, N, DIM = 1000, 10_000, 256
OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "floors.json")


def _kernel_ab(q_ref, c_ref, cb_ref, out_ref, st_ref, *, levels: int,
               tm: int, tn: int):
    """bf16x3 matmul + epilogue (+ ``levels`` stack levels of packed
    selection over every score).  levels=0 is program A."""
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
            st_ref[0] = jnp.zeros((tm, _LANES), jnp.int32)
        m1 = jnp.max(s, axis=1, keepdims=True)
        st_ref[0] = st_ref[0] + m1.astype(jnp.int32)
    else:
        @pl.when(j == 0)
        def _():
            for i in range(levels):
                st_ref[i] = jnp.full((tm, _LANES), jnp.iinfo(jnp.int32).min,
                                     jnp.int32)
        clean = jnp.int32(~127)
        u = _f32_to_u(jax.lax.bitcast_convert_type(s, jnp.int32))
        st = [st_ref[i] for i in range(levels)]
        base = jnp.int32(127) - j * jnp.int32(tn // _LANES)
        for g in range(tn // _LANES):
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


def measure_ab(levels: int, q, cp, cbp, tm: int, tn: int):
    mp = 1024
    np_ = cbp.shape[1]
    kern = functools.partial(_kernel_ab, levels=levels, tm=tm, tn=tn)
    call = pl.pallas_call(
        kern,
        grid=(mp // tm, np_ // tn),
        in_specs=[
            pl.BlockSpec((tm, 2 * DIM), lambda i, j: (i, 0)),
            pl.BlockSpec((tn, 2 * DIM), lambda i, j: (j, 0)),
            pl.BlockSpec((1, tn), lambda i, j: (0, j)),
        ],
        out_specs=[pl.BlockSpec((tm, _LANES), lambda i, j: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((mp, _LANES), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((max(levels, 1), tm, _LANES),
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


def measure_shipped(k: int, qf, cf, selection: str):
    cq = jnp.asarray(qf)
    cc = jnp.asarray(cf)
    jax.block_until_ready((cq, cc))
    cfg = SearchConfig(selection=selection, use_autotune_cache=False)

    def step(qq):
        v, _ = fused_topk(qq, cc, k, "cosine", config=cfg)
        return jnp.max(v, axis=1, keepdims=True)

    return [device_step_seconds(step, cq, chain_lo=8, chain_hi=136,
                                iters=3) * 1e3 for _ in range(3)]


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(7)
    qf = rng.standard_normal((M, DIM)).astype(np.float32)
    cf = rng.standard_normal((N, DIM)).astype(np.float32)
    qn = qf / np.linalg.norm(qf, axis=1, keepdims=True)
    qp = np.zeros((1024, DIM), np.float32)
    qp[:M] = qn
    q = jax.block_until_ready(
        jnp.asarray(np.asarray(_split_hi_lo(jnp.asarray(qp)))))

    res = {}
    # ---- k<=16 tiling (bq=256, bn=2048) --------------------------------
    cp, cbp = prepare_corpus(jnp.asarray(cf), "cosine", tn=2048,
                             precision="bf16x3")
    cp, cbp = jax.block_until_ready((cp, cbp))
    for tag, lv in (("A_2048", 0), ("B1_2048", 1), ("B5_2048", 5)):
        ts = measure_ab(lv, q, cp, cbp, 256, 2048)
        res[tag] = ts
        print(json.dumps({"program": tag, "ms": [round(t, 4) for t in ts]}),
              flush=True)

    # ---- k>16 tiling (bq=128, bn=4096; what shipped k=100/512 use) -----
    cp4, cbp4 = prepare_corpus(jnp.asarray(cf), "cosine", tn=4096,
                               precision="bf16x3")
    cp4, cbp4 = jax.block_until_ready((cp4, cbp4))
    for tag, lv in (("A_4096", 0), ("B1_4096", 1), ("B4_4096", 4)):
        ts = measure_ab(lv, q, cp4, cbp4, 128, 4096)
        res[tag] = ts
        print(json.dumps({"program": tag, "ms": [round(t, 4) for t in ts]}),
              flush=True)

    # ---- shipped paths --------------------------------------------------
    for tag, k, sel in (("C_k10_gpop", 10, "gpop"),
                        ("C_k100_gstack", 100, "gstack"),
                        ("C_k512_gstack", 512, "gstack")):
        ts = measure_shipped(k, qf, cf, sel)
        res[tag] = ts
        print(json.dumps({"program": tag, "ms": [round(t, 4) for t in ts]}),
              flush=True)

    floors = {
        "device_kind": jax.devices()[0].device_kind,
        "workload": f"{M}x{N}x{DIM}d f32 cosine (canonical)",
        "mxu_epilogue_ms": round(min(res["A_2048"]), 4),
        "mxu_epilogue_bn4096_ms": round(min(res["A_4096"]), 4),
        # per-tier floors: the tiling each shipped tier uses
        "floor_k10_ms": round(min(res["B1_2048"]), 4),
        "floor_k100_ms": round(min(res["B1_4096"]), 4),
        "floor_k512_ms": round(min(res["B4_4096"]), 4),
        "shipped_k10_ms": round(min(res["C_k10_gpop"]), 4),
        "shipped_k100_ms": round(min(res["C_k100_gstack"]), 4),
        "shipped_k512_ms": round(min(res["C_k512_gstack"]), 4),
        "provenance": "tools/exp_floor.py",
    }
    for k in (10, 100, 512):
        floors[f"fraction_of_floor_k{k}"] = round(
            floors[f"floor_k{k}_ms"] / floors[f"shipped_k{k}_ms"], 4)
    with open(OUT_PATH, "w") as f:
        json.dump(floors, f, indent=1, sort_keys=True)
    print(json.dumps(floors), flush=True)


if __name__ == "__main__":
    main()
