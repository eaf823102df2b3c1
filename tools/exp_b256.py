"""Attribute the batch-256 corpus-scale cost (VERDICT r04 item 1).

At 10M x 768 int8 k=100 b256 the op measures 86.6 ms vs a 42.7 ms matmul
term; at 2M x 256 b256 13.7 vs ~5 (bf16x3).  This experiment splits the
non-matmul cost on the fast-iteration proxy (2M x 256, int8 storage,
batch 256) into its real owners before optimizing:

  matmul   A-style kernel: int8c matmul + epilogue + (tm,1) max, no
           selection — the MXU + HBM term at this tiling.
  +build   A + the segmented-gstack u-transform + L-level insertion over
           every score (no panel flush, no finish) — the VPU build term.
  +flush   full gstack kernel with the finish stubbed to a slice — adds
           the per-segment panel flush HBM writes.
  full     product path (kernel + XLA approx_max_k finish + decode).

Also sweeps the finish alternatives standalone on the real panel shape
(approx_max_k vs lax.top_k vs per-segment two-stage) and the posu
variant of the build (scores biased positive so the u-transform is a
raw bitcast: 3 fewer VPU ops/element — viable for cosine whose scores
are bounded).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_b256.py [stage]
"""
import functools
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import importlib

import polars_matmul_tpu  # noqa: F401
from polars_matmul_tpu.config import SearchConfig

FT = importlib.import_module("polars_matmul_tpu.kernels.fused_topk")

N, DIM, K, B = 2_000_000, 256, 100, 256
_LANES = 128


def make_data_queries():
    rng = np.random.default_rng(11)
    return rng.standard_normal((B, DIM)).astype(np.float32), True


def make_data():
    q, _ = make_data_queries()
    # corpus in chunks to bound host memory churn
    c = np.empty((N, DIM), np.float32)
    for i in range(0, N, 250_000):
        r2 = np.random.default_rng(100 + i)
        c[i:i + 250_000] = r2.standard_normal((250_000, DIM))
    return q, c


def chain(step, q, extra=(), lo=2, hi=8, iters=3):
    def chained(n):
        @jax.jit
        def f(qq, t, *ex):
            qq = qq + t

            def body(i, qq):
                return qq + step(qq, *ex) * 1e-30

            return jax.lax.fori_loop(0, n, body, qq)[0, 0]

        return f

    f_lo, f_hi = chained(lo), chained(hi)
    tick = [0.0]

    def run(g):
        tick[0] += 1e-7
        t0 = time.time()
        float(np.asarray(g(q, jnp.float32(tick[0]), *extra)))
        return time.time() - t0

    run(f_lo), run(f_hi)
    a = min(run(f_lo) for _ in range(iters))
    b = min(run(f_hi) for _ in range(iters))
    return (b - a) / (hi - lo) * 1e3


# ---------------------------------------------------------------------------
# A/build kernels at the product tiling (int8c, tm=128, tn=4096)
# ---------------------------------------------------------------------------


def _kernel_build(q_ref, c_ref, cb_ref, out_ref, st_ref, *, levels: int,
                  tm: int, tn: int, posu: bool):
    """int8c matmul + epilogue + (levels>0) segmented-gstack-style build.

    posu=True biases scores positive in the epilogue and skips the
    _f32_to_u transform (bitcast alone is monotone for positive floats).
    """
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    dsplit = q_ref.shape[1] // 2
    qh, ql = q_ref[:, :dsplit], q_ref[:, dsplit:]
    ch = c_ref[:].astype(jnp.bfloat16)
    p = jax.lax.Precision.DEFAULT
    d = (jax.lax.dot_general(qh, ch, (((1,), (1,)), ((), ())), precision=p,
                             preferred_element_type=jnp.float32)
         + jax.lax.dot_general(ql, ch, (((1,), (1,)), ((), ())),
                               precision=p,
                               preferred_element_type=jnp.float32))
    s = d * cb_ref[0:1, :] + cb_ref[1:2, :]
    tiles_per_seg = (_LANES * _LANES) // tn
    if levels == 0:
        @pl.when(j == 0)
        def _():
            st_ref[0] = jnp.zeros((tm, _LANES), jnp.int32)
        m1 = jnp.max(s, axis=1, keepdims=True)
        st_ref[0] = st_ref[0] + m1.astype(jnp.int32)
    else:
        @pl.when(j % tiles_per_seg == 0)
        def _():
            for i in range(levels):
                st_ref[i] = jnp.full((tm, _LANES), jnp.iinfo(jnp.int32).min,
                                     jnp.int32)
        clean = jnp.int32(~127)
        bits = jax.lax.bitcast_convert_type(s, jnp.int32)
        u = bits if posu else FT._f32_to_u(bits)
        st = [st_ref[i] for i in range(levels)]
        gpt = tn // _LANES
        base = (jnp.int32(_LANES - 1) - (j % tiles_per_seg) * jnp.int32(gpt))
        for g in range(gpt):
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


def measure_build(levels, qp, cp, cbp, tm, tn, posu=False):
    mp = qp.shape[0]
    np_ = cbp.shape[1]
    kern = functools.partial(_kernel_build, levels=levels, tm=tm, tn=tn,
                             posu=posu)
    call = pl.pallas_call(
        kern,
        grid=(mp // tm, np_ // tn),
        in_specs=[
            pl.BlockSpec((tm, 2 * DIM), lambda i, j: (i, 0)),
            pl.BlockSpec((tn, DIM), lambda i, j: (j, 0)),
            pl.BlockSpec((2, tn), lambda i, j: (0, j)),
        ],
        out_specs=[pl.BlockSpec((tm, _LANES), lambda i, j: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((mp, _LANES), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((max(levels, 1), tm, _LANES),
                                   jnp.int32)],
    )

    def step(qq, cp_, cb_):
        with jax.enable_x64(False):
            (o,) = call(qq, cp_, cb_)
        return o[:, :1].astype(jnp.float32)

    return chain(step, qp, extra=(cp, cbp))


# ---------------------------------------------------------------------------


CODES_CACHE = "/tmp/exp_b256_codes.npz"


def main():
    assert jax.default_backend() == "tpu"
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    q, _have = make_data_queries()

    try:
        z = np.load(CODES_CACHE)
        codes, scales = z["codes"], z["scales"]
    except OSError:
        _, c = make_data()
        codes, scales = map(np.asarray, FT.quantize_int8(jnp.asarray(c)))
        del c
        np.savez(CODES_CACHE, codes=codes, scales=scales)
    cfg = SearchConfig(precision="int8c", use_autotune_cache=False)
    tn = FT.corpus_tile_rows(DIM, cfg, K)
    # TILE-PAD like prepare_corpus does (first run of this experiment
    # passed the raw 2M rows: 2M % 2048 != 0 left the last panel slab
    # unflushed garbage, which fired the exactness fallback on every
    # call and mismeasured "full" as 152 ms)
    np_pad = ((N + tn - 1) // tn) * tn
    codes_p = np.zeros((np_pad, DIM), np.int8)
    codes_p[:N] = codes
    scales_p = np.pad(scales, (0, np_pad - N), constant_values=1.0)
    cp = jnp.asarray(codes_p)
    cbp = FT.prepare_int8_bias(cp, jnp.asarray(scales_p), "cosine", N)
    cp, cbp = jax.block_until_ready((cp, cbp))
    print(json.dumps({"tag": "setup", "tn": tn,
                      "corpus_gb": round(cp.size / 1e9, 2)}), flush=True)

    qj = jax.block_until_ready(jnp.asarray(q))

    if stage in ("all", "full"):
        # full product path (auto -> segmented gstack)
        def stepf(qq, cp_, cb_):
            v, _ = FT.fused_topk_prepared(qq, cp_, cb_, K, "cosine",
                                          tn=tn, config=cfg)
            return jnp.max(v, axis=1, keepdims=True)

        ms = chain(stepf, qj, extra=(cp, cbp))
        print(json.dumps({"tag": "full", "ms": round(ms, 3)}), flush=True)

        orig = FT._gstack_decode

        # detection force-disabled: same kernel + same finish, the
        # lax.cond exact-fallback branch can never run.  full - nobad =
        # what the detection/cond costs (it should be ~0 when bad never
        # fires; a large delta means the cond itself, not the finish, is
        # the regression).
        def nobad(*a, **kw):
            vals, idx, _bad = orig(*a, **kw)
            return vals, idx, jnp.zeros((), jnp.bool_)

        FT._gstack_decode = nobad
        FT._run_prepared_jit.clear_cache()
        try:
            ms_nb = chain(stepf, qj, extra=(cp, cbp))
        finally:
            FT._gstack_decode = orig
            FT._run_prepared_jit.clear_cache()
        print(json.dumps({"tag": "full-nobad", "ms": round(ms_nb, 3)}),
              flush=True)

        # does bad actually fire on this data?  single un-chained call,
        # decode instrumented to smuggle bad out through vals[0, 0]
        # (returning the tracer itself would escape the jit).
        def spy(*a, **kw):
            vals, idx, bad = orig(*a, **kw)
            vals = vals.at[0, 0].set(
                jnp.where(bad, 12345.0, vals[0, 0]))
            return vals, idx, jnp.zeros((), jnp.bool_)

        FT._gstack_decode = spy
        FT._run_prepared_jit.clear_cache()
        try:
            vv, _ = FT.fused_topk_prepared(qj, cp, cbp, K, "cosine",
                                           tn=tn, config=cfg)
            fired = bool(np.asarray(vv)[0, 0] == 12345.0)
        finally:
            FT._gstack_decode = orig
            FT._run_prepared_jit.clear_cache()
        print(json.dumps({"tag": "detection-fired", "bad": fired}),
              flush=True)

        # finish stubbed to a slice: kernel cost only (build + flush)
        def raw(u_panel, k, total_groups, low_mask, depth, n_levels,
                m_valid, n_segs=1, posu=False):
            vals = u_panel[:, :k].astype(jnp.float32)
            return vals, u_panel[:, :k], jnp.zeros((), jnp.bool_)

        FT._gstack_decode = raw
        FT._run_prepared_jit.clear_cache()
        try:
            ms2 = chain(stepf, qj, extra=(cp, cbp))
        finally:
            FT._gstack_decode = orig
            FT._run_prepared_jit.clear_cache()
        print(json.dumps({"tag": "kernel-only(nofinish)",
                          "ms": round(ms2, 3)}), flush=True)

    if stage in ("all", "build"):
        # query prep mirrored from _run_prepared (cosine pre-scale + hi|lo)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        qp = jax.block_until_ready(jnp.asarray(np.asarray(
            FT._split_hi_lo(jnp.asarray(qn)))))
        _, _, _, n_levels, n_segs = FT._gstack_geometry(
            cbp.shape[1] // _LANES, K)
        print(json.dumps({"tag": "geom", "n_levels": int(n_levels),
                          "n_segs": int(n_segs)}), flush=True)
        for tag, lv, posu in (
            ("matmul+epi(L0)", 0, False),
            ("L1", 1, False),
            (f"L{n_levels}", n_levels, False),
            (f"L{n_levels}-posu", n_levels, True),
        ):
            ms = measure_build(lv, qp, cp, cbp, 128, tn, posu)
            print(json.dumps({"tag": tag, "ms": round(ms, 3)}), flush=True)

    if stage in ("all", "finish"):
        # standalone finish candidates on the real panel shape
        _, _, _, n_levels, n_segs = FT._gstack_geometry(
            cbp.shape[1] // _LANES, K)
        W = n_segs * n_levels * _LANES
        rngp = np.random.default_rng(3)
        panel = jnp.asarray(
            rngp.standard_normal((B, W)).astype(np.float32))
        panel = jax.block_until_ready(panel)

        def f_approx(p):
            v, i = jax.lax.approx_max_k(p, K, recall_target=1.0)
            return jnp.max(v, axis=1, keepdims=True)

        def f_topk(p):
            v, i = jax.lax.top_k(p, K)
            return jnp.max(v, axis=1, keepdims=True)

        def f_twostage(p):
            ps = p.reshape(B, n_segs, n_levels * _LANES)
            v1, _ = jax.lax.approx_max_k(ps, K, recall_target=1.0)
            v2, _ = jax.lax.approx_max_k(v1.reshape(B, n_segs * K), K,
                                         recall_target=1.0)
            return jnp.max(v2, axis=1, keepdims=True)

        def f_passonly(p):
            # the chain-coupling elementwise pass alone (subtract this
            # from the others: p + per-row qq scalar defeats the
            # loop-invariant hoisting that zeroed the first measurement)
            return jnp.max(p, axis=1, keepdims=True)

        for tag, fn in (("passonly", f_passonly),
                        ("approx_max_k", f_approx),
                        ("lax.top_k", f_topk),
                        ("two-stage", f_twostage)):
            try:
                ms = chain(
                    lambda qq, pp, fn=fn: fn(pp + qq[:, :1]), qj,
                    extra=(panel,), lo=2, hi=8)
            except Exception as e:
                print(json.dumps({"tag": f"finish-{tag}",
                                  "error": str(e)[:120]}), flush=True)
                continue
            print(json.dumps({"tag": f"finish-{tag}", "panel_w": W,
                              "ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
