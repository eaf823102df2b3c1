"""Probed (clustered) search benchmark: bytes-read scaling + recall.

Big-corpus serving is HBM-bandwidth-bound once tile pruning removes the
selection cost (see benchmark_bigcorpus.py): time ~ corpus bytes read.
Probed search attacks the bytes directly — rows are k-means clustered
into whole corpus tiles and each query block visits only the ``probe``
fraction ranked best by a tiny centroid matmul (scalar-prefetch tile
lists; unvisited tiles never leave HBM).  The expectation this benchmark
checks: search time scales ~linearly in ``probe``, and recall vs the
exhaustive scan stays high when the data actually clusters.

The corpus is generated ON DEVICE as a Gaussian-blob mixture (uniform
random data has no cluster structure — probing it trades recall for
nothing).  Timing is chain-differenced (utils/autotune.py): honest
device time on tunneled deployments.

Usage: python examples/benchmark_clustered.py [--rows 2000000]
       [--dim 256] [--k 10] [--clusters 256] [--batch 64]
       [--probes 1.0 0.25 0.1 0.05]
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
    ap.add_argument("--clusters", type=int, default=256)
    ap.add_argument("--centers", type=int, default=200,
                    help="generator mixture components")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--probes", type=float, nargs="+",
                    default=[1.0, 0.25, 0.1, 0.05])
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from polars_matmul_tpu.config import SearchConfig
    from polars_matmul_tpu.kernels.fused_topk import (
        corpus_tile_rows, fused_topk_prepared, prepare_corpus,
        query_tile_rows)
    from polars_matmul_tpu.ops.cluster import (
        assign_rows, cluster_layout, kmeans, permute_rows, probe_tiles,
        resolve_probe)
    from polars_matmul_tpu.ops.metrics import Metric

    n, dim, k, m = args.rows, args.dim, args.k, args.batch
    cfg = SearchConfig()
    tn = corpus_tile_rows(dim, cfg, k)
    tm = query_tile_rows(m, dim, cfg, k)

    # --- device-generated blob mixture (clusterable by construction) ---
    with jax.enable_x64(False):
        kc, kn, kq, ka = jax.random.split(jax.random.PRNGKey(0), 4)
        centers = jax.random.normal(kc, (args.centers, dim)) * 4.0
        comp = jax.random.randint(ka, (n,), 0, args.centers)
        c = centers[comp] + jax.random.normal(kn, (n, dim))
        qcomp = jax.random.randint(jax.random.PRNGKey(9), (m,), 0,
                                   args.centers)
        q = centers[qcomp] + jax.random.normal(kq, (m, dim))
        q = jax.block_until_ready(q)

        # --- cluster + permuted layout (ingestion cost, one-shot) ------
        t0 = time.perf_counter()
        sample = c[jax.random.choice(jax.random.PRNGKey(3), n,
                                     (min(n, 131072),), replace=False)]
        cent, _ = kmeans(sample, args.clusters, iters=8, seed=0)
        assign = assign_rows(c, cent)
        lay = cluster_layout(assign, args.clusters, tn)
        cperm = permute_rows(c, jnp.asarray(lay.perm))
        live = jnp.asarray(lay.perm >= 0)
        cp, cbp = jax.jit(functools.partial(
            prepare_corpus, metric=Metric.COSINE, tn=tn,
            precision=cfg.precision))(cperm)
        bias = jnp.where(live, cbp[-1], -np.inf)[None, :]
        cbp = jnp.concatenate([cbp[:-1], bias], axis=0)
        jax.block_until_ready(cbp)
        t_ing = time.perf_counter() - t0
        del c, cperm
    n_tiles = lay.n_tiles
    tc = jnp.asarray(lay.tile_cluster)
    print(f"corpus {n} x {dim} in {args.clusters} clusters -> "
          f"{n_tiles} tiles of {tn} rows (+{lay.n_padded - n} slack), "
          f"ingestion {t_ing:.1f}s, backend={jax.default_backend()}")

    @functools.partial(jax.jit, static_argnames=("p", "iters"))
    def chain(q, cp, cbp, cent, tc, tick, p, iters):
        def body(_, qq):
            tiles = (None if p is None else
                     probe_tiles(qq, cent, tc, p=p, tm=tm,
                                 metric_v="cosine"))
            v, _i = fused_topk_prepared(qq, cp, cbp, k, "cosine", tn=tn,
                                        config=cfg, tiles=tiles)
            return qq + jnp.max(v) * 1e-30

        out = jax.lax.fori_loop(0, iters, body, q + tick)
        return jnp.sum(out[0])

    @functools.partial(jax.jit, static_argnames="p")
    def once(q, cp, cbp, cent, tc, p):
        tiles = (None if p is None else
                 probe_tiles(q, cent, tc, p=p, tm=tm, metric_v="cosine"))
        return fused_topk_prepared(q, cp, cbp, k, "cosine", tn=tn,
                                   config=cfg, tiles=tiles)[1]

    exact_idx = None
    hdr = (f"{'probe':>8s} {'tiles':>6s} {'ms/search':>10s} "
           f"{'corpus GB/s':>12s} {'recall@'+str(k):>10s}")
    print(hdr)
    print("-" * len(hdr))
    for probe in args.probes:
        p, exhaustive = resolve_probe(float(probe), n_tiles)
        pk = None if exhaustive else p
        gb = ((m + tm - 1) // tm) * p * tn * dim * 4 / 1e9

        idx = np.asarray(once(q, cp, cbp, cent, tc, pk))
        if exact_idx is None and exhaustive:
            exact_idx = idx
        rec = (np.nan if exact_idx is None else np.mean(
            [len(set(a) & set(b)) / k for a, b in zip(idx, exact_idx)]))

        lo = max(2, args.iters // 8)
        for it in (lo, args.iters):
            float(np.asarray(chain(q, cp, cbp, cent, tc,
                                   jnp.float32(0.0), pk, it)))
        ts = []
        for t_ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(chain(q, cp, cbp, cent, tc,
                                   jnp.float32(t_ + 1), pk, args.iters)))
            thi = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(np.asarray(chain(q, cp, cbp, cent, tc,
                                   jnp.float32(t_ + 101), pk, lo)))
            tlo = time.perf_counter() - t0
            ts.append((thi - tlo) / (args.iters - lo))
        t = min(ts)
        print(f"{probe:8.2f} {p:6d} {t*1e3:10.3f} {gb/t:12.1f} "
              f"{rec:10.3f}")

    # -- drift -> rebuild mechanics ---------------------------------------
    # add() places new rows against the centroids fitted at ingestion; the
    # `drift` signal counts those stale placements.  rebuild() re-fits,
    # re-lays out storage-native (exhaustive results invariant — checked
    # below) and COMPACTS the layout (overflow tiles and their slack go
    # away, so every probe fraction reads fewer bytes).  The recall
    # effect of re-fitting is workload-dependent (block-union probing can
    # even benefit from accidental concentration): the drift signal says
    # when to RE-MEASURE recall, not that it collapsed.
    import polars_matmul_tpu as pmt

    rng2 = np.random.default_rng(7)
    nc, dim2 = min(args.rows, 120_000), 64
    centers = rng2.standard_normal((40, dim2)).astype(np.float32) * 4.0
    base = (centers[rng2.integers(0, 40, nc)]
            + rng2.standard_normal((nc, dim2))).astype(np.float32)
    cc = pmt.ClusteredCorpus(base, clusters=40)
    new_centers = (np.full((1, dim2), 18.0, np.float32)
                   + rng2.standard_normal((12, dim2)) * 6.0)
    drift_rows = (new_centers[rng2.integers(0, 12, nc // 2)]
                  + rng2.standard_normal((nc // 2, dim2))).astype(np.float32)
    cc.add(drift_rows)
    qd = (new_centers[rng2.integers(0, 12, 16)]
          + rng2.standard_normal((16, dim2))).astype(np.float32)
    ei, ev = cc.topk(qd, 10)

    def rec_at(pr):
        pi, _ = cc.topk(qd, 10, probe=pr)
        return np.mean([len(set(a) & set(b)) / 10 for a, b in zip(pi, ei)])

    r_before = rec_at(0.2)
    d_before, tiles_before = cc.drift, cc.layout.n_tiles
    t0 = time.perf_counter()
    cc.rebuild()
    t_rebuild = time.perf_counter() - t0
    ei2, ev2 = cc.topk(qd, 10)
    exhaustive_ok = bool(
        np.array_equal(ei2, ei)
        or np.allclose(np.sort(ev2, 1), np.sort(ev, 1), rtol=1e-6))
    r_after = rec_at(0.2)
    print(f"\ndrift -> rebuild ({nc} rows + {nc // 2} drifted, probe=0.2):")
    print(f"  drift signal {d_before:.2f} -> {cc.drift:.2f}; "
          f"tiles {tiles_before} -> {cc.layout.n_tiles} (compaction); "
          f"rebuild {t_rebuild*1e3:.0f} ms")
    print(f"  exhaustive invariant: {exhaustive_ok}; "
          f"probed recall@10 {r_before:.3f} -> {r_after:.3f} "
          f"(workload-dependent; drift says re-measure)")


if __name__ == "__main__":
    main()
