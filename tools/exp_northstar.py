"""North-star corpus for real: 10M x 768d, k=100, one v5e chip.

VERDICT r02 item 3 / BASELINE.md:28: the scaling config had never been
executed at size.  int8 storage (~7.4 GB codes) fits one chip; int4
(~3.7 GB) too.  Stages (each its own process so tunnel stalls cannot
lose finished work; data is regenerated deterministically per stage):

  gen     sanity-print the blob generator (no device)
  dense8  Corpus(storage="int8"): host-quantize + upload codes, measure
          k=100 batch {8,256} + k=10 batch 256 device time (chain
          differencing on the prepared path), save the k=100 batch-256
          indices as the recall ground truth
  dense4  Corpus(storage="int4"): same corpus nibble-packed, k=100 b256
  probed  ClusteredCorpus(storage="int8"), probe in {0.1, 0.25}:
          recall@100 vs the dense-int8 ground truth + device time

Blob data (2048 centers, sigma=0.6 noise) gives the probed stage a real
cluster structure; queries are center-seeded with fresh noise.

Run: PYTHONPATH=/root/.axon_site:/root/repo \
       python tools/exp_northstar.py <stage>
"""
import json
import sys
import time

import numpy as np

N, DIM, K = 10_000_000, 768, 100
CENTERS = 2048
CHUNK = 500_000
GT_PATH = "/tmp/northstar_gt.npz"
HBM_GBPS = 819.0  # v5e HBM bandwidth, for the bytes-read roofline rows


def gen_centers():
    rng = np.random.default_rng(1234)
    return rng.standard_normal((CENTERS, DIM)).astype(np.float32)


def gen_chunk(i, centers):
    """Deterministic chunk i of the corpus: blob rows around centers."""
    rng = np.random.default_rng(10_000 + i)
    ids = rng.integers(0, CENTERS, size=CHUNK)
    return (centers[ids]
            + 0.6 * rng.standard_normal((CHUNK, DIM)).astype(np.float32))


CORPUS_CACHE = "/tmp/northstar_corpus.npy"


def gen_corpus():
    """Deterministic 10M x 768 blob corpus; cached to disk so the later
    stages (dense4, probed — each its own process) skip the ~20-minute
    single-core regeneration."""
    centers = gen_centers()
    t0 = time.time()
    try:
        c = np.load(CORPUS_CACHE, mmap_mode=None)
        if c.shape == (N, DIM):
            print(json.dumps({"tag": "gen-cached",
                              "wall_s": round(time.time() - t0, 1)}),
                  flush=True)
            return c, centers
    except (OSError, ValueError):
        pass
    c = np.empty((N, DIM), np.float32)
    for i in range(N // CHUNK):
        c[i * CHUNK:(i + 1) * CHUNK] = gen_chunk(i, centers)
    print(json.dumps({"tag": "gen", "wall_s": round(time.time() - t0, 1)}),
          flush=True)
    try:
        np.save(CORPUS_CACHE, c)
    except OSError:
        pass
    return c, centers


def gen_queries(m=256):
    centers = gen_centers()
    rng = np.random.default_rng(777)
    ids = rng.integers(0, CENTERS, size=m)
    return (centers[ids]
            + 0.6 * rng.standard_normal((m, DIM)).astype(np.float32)
            ).astype(np.float32)


def chain_ms(fn_step, q, jnp, jax, extra=(), chain_lo=2, chain_hi=10,
             iters=3):
    """Device ms/step by chain differencing (see utils/autotune).

    ``extra``: device operands (e.g. the prepared corpus) passed as REAL
    jit arguments — closing over a multi-GB device array would bake it
    into each executable as a lowering constant, and serializing that
    through the RPC tunnel stalls for minutes per compile."""
    def chained(n):
        @jax.jit
        def f(qq, t, *ex):
            qq = qq + t

            def body(i, qq):
                return qq + fn_step(qq, *ex) * 1e-30

            return jax.lax.fori_loop(0, n, body, qq)[0, 0]

        return f

    f_lo, f_hi = chained(chain_lo), chained(chain_hi)
    tick = [0.0]

    def run(g):
        tick[0] += 1e-7
        t0 = time.time()
        float(np.asarray(g(q, jnp.float32(tick[0]), *extra)))
        return time.time() - t0

    run(f_lo), run(f_hi)  # compile both
    lo = min(run(f_lo) for _ in range(iters))
    hi = min(run(f_hi) for _ in range(iters))
    return (hi - lo) / (chain_hi - chain_lo) * 1e3


def stage_dense(storage):
    import jax
    import jax.numpy as jnp
    import polars_matmul_tpu as pmt
    from polars_matmul_tpu.kernels.fused_topk import fused_topk_prepared
    from polars_matmul_tpu.ops.metrics import Metric

    assert jax.default_backend() == "tpu"
    c, _ = gen_corpus()
    t0 = time.time()
    corpus = pmt.Corpus(c, storage=storage)
    del c
    print(json.dumps({"tag": f"{storage}-build",
                      "wall_s": round(time.time() - t0, 1)}), flush=True)
    q = gen_queries(256)

    cp, cbp, tn = corpus._prepared_for(Metric.parse("cosine"), K)
    cp, cbp = jax.block_until_ready((cp, cbp))
    code_bytes = cp.size * cp.dtype.itemsize
    # The prepared form is quantized codes: the kernel must run in the
    # storage's precision mode, exactly as Corpus.topk derives it.
    cfg = corpus.config.with_updates(
        precision=corpus._effective_precision())
    # round 5 adds the dense big-k batch-256 rows (k=256/512): the
    # panel-reduce finish is where their r4 cost (137/214 ms) lived
    for (m, k) in ((256, 100), (8, 100), (256, 10), (256, 256),
                   (256, 512)):
        if storage == "int4" and (m, k) != (256, 100) and (m, k) != (8, 100):
            continue
        qj = jax.block_until_ready(jnp.asarray(q[:m]))

        def step(qq, cpx, cbx, k=k):
            v, _ = fused_topk_prepared(qq, cpx, cbx, k, "cosine", tn=tn,
                                       config=cfg)
            return jnp.max(v, axis=1, keepdims=True)

        ms = chain_ms(step, qj, jnp, jax, extra=(cp, cbp))
        floor = code_bytes / (HBM_GBPS * 1e9) * 1e3
        print(json.dumps({
            "tag": f"{storage}-k{k}-b{m}", "device_ms": round(ms, 3),
            "ms_per_query": round(ms / m, 4),
            "hbm_floor_ms": round(floor, 3),
            "fraction_of_hbm_floor": round(floor / ms, 3),
            "corpus_gb": round(code_bytes / 1e9, 2)}), flush=True)

    if storage == "int8":
        # ground truth for the probed stage: the product path's own
        # answer on the same quantized corpus
        idx, scores = corpus.topk(q, K, "cosine")
        np.savez(GT_PATH, idx=idx, q=q)
        print(json.dumps({"tag": "gt-saved", "path": GT_PATH}), flush=True)


def stage_probed():
    import jax
    import polars_matmul_tpu as pmt

    assert jax.default_backend() == "tpu"
    gt = np.load(GT_PATH)
    gt_idx, q = gt["idx"], gt["q"]
    c, _ = gen_corpus()
    t0 = time.time()
    cc = pmt.ClusteredCorpus(c, storage="int8", seed=3)
    del c
    print(json.dumps({"tag": "clustered-build",
                      "wall_s": round(time.time() - t0, 1),
                      "clusters": cc.clusters,
                      "n_tiles": int(cc.layout.tile_cluster.shape[0])}),
          flush=True)
    for probe in (0.1, 0.25):
        t0 = time.time()
        idx, scores = cc.topk(q, K, "cosine", probe=probe)
        wall0 = time.time() - t0
        t0 = time.time()
        idx, scores = cc.topk(q, K, "cosine", probe=probe)
        wall = time.time() - t0
        hits = np.mean([
            len(set(idx[r].tolist()) & set(gt_idx[r].tolist())) / K
            for r in range(idx.shape[0])
        ])
        print(json.dumps({
            "tag": f"probed-{probe}", "recall@100": round(float(hits), 4),
            "wall_ms_first": round(wall0 * 1e3, 1),
            "wall_ms": round(wall * 1e3, 1),
            "note": "wall includes ~25ms RPC tunnel floor + query upload",
        }), flush=True)


def stage_probed_device():
    """Chain-differenced DEVICE ms for the probed path (VERDICT r04 item
    4: the r4 table mixed wall-clock probed rows into a device-ms table)
    over probe x batch x k, with recall against the dense-int8 ground
    truth.  Reuses the product's own jitted dispatch (_probed_fn) with
    the prepared buffers passed as chain arguments."""
    import jax
    import jax.numpy as jnp

    import polars_matmul_tpu as pmt
    from polars_matmul_tpu.api.clustered import _probed_fn
    from polars_matmul_tpu.kernels.fused_topk import query_tile_rows
    from polars_matmul_tpu.ops.cluster import resolve_probe
    from polars_matmul_tpu.ops.metrics import Metric

    assert jax.default_backend() == "tpu"
    gt = np.load(GT_PATH)
    gt_idx, q = gt["idx"], gt["q"]
    c, _ = gen_corpus()
    t0 = time.time()
    cc = pmt.ClusteredCorpus(c, storage="int8", seed=3)
    del c
    print(json.dumps({"tag": "clustered-build",
                      "wall_s": round(time.time() - t0, 1)}), flush=True)
    met = Metric.parse("cosine")
    cp, cbp = jax.block_until_ready(cc._prepared_for(met))
    run_cfg = cc.config
    eff = cc._effective_precision()
    if eff != run_cfg.precision:
        run_cfg = run_cfg.with_updates(precision=eff)
    extras = (cc.centroids, cc._tile_cluster_dev, cc._perm_dev)
    for m in (256, 8):
        for k in (100, 256):
            for probe in (0.05, 0.1, 0.25):
                p, _ex = resolve_probe(probe, cc.layout.n_tiles)
                tm = query_tile_rows(m, cc.dim, cc.config, k)
                fn = _probed_fn(k, met, run_cfg, cc._tn, p, tm, False)

                def step(qq, cpx, cbx, ce, tc, pm, fn=fn):
                    packed = fn(qq, cpx, cbx, ce, tc, pm)
                    return jnp.max(packed[:, :1].astype(jnp.float32),
                                   axis=1, keepdims=True)

                qj = jax.block_until_ready(jnp.asarray(q[:m]))
                ms = chain_ms(step, qj, jnp, jax,
                              extra=(cp, cbp) + extras)
                # recall of the dense top-100 inside this probed top-k
                idx, _ = cc.topk(q[:m], k, "cosine", probe=probe,
                                 route=False)
                hits = np.mean([
                    len(set(idx[r].tolist())
                        & set(gt_idx[r][:100].tolist())) / 100
                    for r in range(m)])
                print(json.dumps({
                    "tag": f"probedev-p{probe}-k{k}-b{m}",
                    "device_ms": round(ms, 3),
                    "ms_per_query": round(ms / m, 4),
                    "recall@100": round(float(hits), 4),
                    "tiles_visited": p,
                    "n_tiles": int(cc.layout.n_tiles)}), flush=True)


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "gen"
    if stage == "gen":
        c, _ = gen_corpus()
        print(json.dumps({"tag": "gen-ok", "gb": round(c.nbytes / 1e9, 1)}))
    elif stage == "dense8":
        stage_dense("int8")
    elif stage == "dense4":
        stage_dense("int4")
    elif stage == "probed":
        stage_probed()
    elif stage == "probedev":
        stage_probed_device()
    else:
        raise SystemExit(f"unknown stage {stage}")


if __name__ == "__main__":
    main()
