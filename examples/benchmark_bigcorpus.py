"""Big-corpus serving benchmark: storage tiers x tile pruning.

The serving regime the reference cannot reach (its ceiling is the RAM
needed for the m x n score matrix, reference README.md:12-16): millions
of resident corpus rows searched by small query batches.  Two levers
govern the cost here:

- Exact tile pruning (SearchConfig.prune): one max pass skips a tile's
  k extraction passes unless some row's tile-max strictly beats that
  row's current k-th best.  Selection collapses toward O(N).
- Storage tier: f32 (bf16x3 hi|lo split: f32 bytes), bf16 (half),
  int8 (quarter), int4 (eighth).  Once pruning removes the selection
  cost, a small-batch search is HBM-bandwidth-bound, so bytes == time
  (until the unpack/convert VPU floor takes over for int8/int4).

The corpus is generated ON DEVICE (jax.random) so the benchmark is not
gated on host->device upload bandwidth.  Timing is chain-differenced
(see utils/autotune.py): honest device time on tunneled deployments.

Usage: python examples/benchmark_bigcorpus.py [--rows 2000000]
       [--dim 256] [--k 10] [--batches 8 64]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 64])
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from polars_matmul_tpu.config import SearchConfig
    from polars_matmul_tpu.kernels.fused_topk import (
        corpus_tile_rows, fused_topk_prepared, prepare_corpus,
        quantize_int4, quantize_int8, feature_geometry)
    from polars_matmul_tpu.ops.metrics import Metric

    n, dim, k = args.rows, args.dim, args.k
    cfg0 = SearchConfig()
    tn = corpus_tile_rows(dim, cfg0, k)
    print(f"corpus {n} x {dim}, k={k}, tile={tn} rows "
          f"({(n + tn - 1) // tn} tiles), backend={jax.default_backend()}")

    tiers = {}
    with jax.enable_x64(False):
        c = jax.random.normal(jax.random.PRNGKey(0), (n, dim), jnp.float32)
        tiers["f32/bf16x3"] = ("bf16x3", jax.jit(
            lambda c: prepare_corpus(c, Metric.COSINE, tn=tn,
                                     precision="bf16x3"))(c))
        tiers["bf16"] = ("bf16c", jax.jit(
            lambda c: prepare_corpus(c.astype(jnp.bfloat16), Metric.COSINE,
                                     tn=tn, precision="bf16c"))(c))
        codes, scales = jax.jit(quantize_int8)(c)
        tiers["int8"] = ("int8c", jax.jit(
            lambda co, sc: prepare_corpus(co, Metric.COSINE, tn=tn,
                                          precision="int8c", scales=sc))(
            codes, scales))
        ck, _, _ = feature_geometry(dim)
        p4, s4 = jax.jit(lambda c: quantize_int4(c, ck))(c)
        tiers["int4"] = ("int4c", jax.jit(
            lambda co, sc: prepare_corpus(co, Metric.COSINE, tn=tn,
                                          precision="int4c", scales=sc))(
            p4, s4))
        jax.block_until_ready(tiers)
        del c, codes, scales, p4, s4

    @functools.partial(jax.jit, static_argnames=("precision", "prune",
                                                 "iters"))
    def chain(q, cp, cbp, tick, precision, prune, iters):
        cfg = SearchConfig(precision=precision, prune=prune)

        def body(_, qq):
            v, _i = fused_topk_prepared(qq, cp, cbp, k, "cosine", tn=tn,
                                        config=cfg)
            return qq + jnp.max(v) * 1e-30

        out = jax.lax.fori_loop(0, iters, body, q + tick)
        return jnp.sum(out[0])

    hdr = f"{'tier':>10s} {'batch':>6s} {'prune':>6s} {'ms/search':>10s} " \
          f"{'corpus GB/s':>12s}"
    print(hdr)
    print("-" * len(hdr))
    for name, (precision, (cp, cbp)) in tiers.items():
        gb = cp.size * cp.dtype.itemsize / 1e9
        for m in args.batches:
            q = jax.random.normal(jax.random.PRNGKey(1), (m, dim),
                                  jnp.float32)
            for prune in ("on", "off"):
                # long/short chains differenced: the gap must dwarf the
                # per-RPC noise (~tens of ms on tunneled deployments)
                lo = max(2, args.iters // 8)
                for it in (lo, args.iters):
                    float(np.asarray(chain(q, cp, cbp, jnp.float32(0.0),
                                           precision, prune, it)))
                ts = []
                for t_ in range(3):
                    t0 = time.perf_counter()
                    float(np.asarray(chain(q, cp, cbp, jnp.float32(t_ + 1),
                                           precision, prune, args.iters)))
                    thi = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    float(np.asarray(chain(q, cp, cbp,
                                           jnp.float32(t_ + 101),
                                           precision, prune, lo)))
                    tlo = time.perf_counter() - t0
                    ts.append((thi - tlo) / (args.iters - lo))
                t = min(ts)
                print(f"{name:>10s} {m:6d} {prune:>6s} {t*1e3:10.3f} "
                      f"{gb/t:12.1f}")


if __name__ == "__main__":
    main()
