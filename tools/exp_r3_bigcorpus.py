"""Round-3 big-corpus (2M x 256d) measurements: segmented gstack.

VERDICT r02 item 2 targets: 2M x 256d k=100 batch-256 from 120 ms
(per-tile stack) to <= 40 ms, batch-8 from 21.9 ms to <= 8 ms.  The
segmented gstack replaces the O(k)-per-tile stack pop with a 2-op/level
insertion over persistent per-128-group-segment stacks + one XLA
approx_max_k finish over the flushed (m, segs*levels*128) panel.
Also records k=10 with segmented gstack vs the extract incumbent.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_r3_bigcorpus.py
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import polars_matmul_tpu  # noqa: F401
    from polars_matmul_tpu.config import SearchConfig
    from polars_matmul_tpu.kernels.fused_topk import (
        corpus_tile_rows, fused_topk_prepared, prepare_corpus)

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    n, d = 2_000_000, 256
    c = rng.standard_normal((n, d)).astype(np.float32)

    preps = {}
    t0 = time.time()
    for k in (10, 100):
        cfg = SearchConfig()
        tn = corpus_tile_rows(d, cfg, k)
        if tn not in preps:
            cp, cbp = jax.jit(
                lambda cc, tn=tn: prepare_corpus(
                    jnp.asarray(cc), "cosine", tn=tn,
                    precision="bf16x3"))(c)
            preps[tn] = (jax.block_until_ready(cp),
                         jax.block_until_ready(cbp))
    print(json.dumps({"tag": "prep-up", "wall_s": round(time.time()-t0, 1),
                      "tns": list(preps)}), flush=True)

    def chain_seconds(k, cfg, tn, cp, cbp, q, chain, iters=4):
        @jax.jit
        def f(qq, cp, cbp, t):
            qq = qq + t

            def body(i, qq):
                v, _ = fused_topk_prepared(qq, cp, cbp, k, "cosine",
                                           tn=tn, config=cfg)
                return qq + jnp.max(v, axis=1, keepdims=True) * 1e-30

            return jax.lax.fori_loop(0, chain, body, qq)[0, 0]

        tick = [0.0]

        def call():
            tick[0] += 1e-7
            return float(np.asarray(f(q, cp, cbp, jnp.float32(tick[0]))))

        call()
        ts = []
        for _ in range(iters):
            t0 = time.time()
            call()
            ts.append(time.time() - t0)
        return min(ts)

    def measure(tag, sel, k, m, prune="auto"):
        cfg = SearchConfig(selection=sel, prune=prune)
        tn = corpus_tile_rows(d, SearchConfig(), k)
        cp, cbp = preps[tn]
        q = jnp.asarray(rng.standard_normal((m, d)), dtype=jnp.float32)
        jax.block_until_ready(q)
        t_lo = chain_seconds(k, cfg, tn, cp, cbp, q, 4)
        t_hi = chain_seconds(k, cfg, tn, cp, cbp, q, 24)
        t = (t_hi - t_lo) / 20
        print(json.dumps({"tag": tag, "k": k, "m": m,
                          "device_ms": round(t * 1e3, 4)}), flush=True)

    # k=100: segmented gstack vs the round-2 incumbents' recorded numbers
    # (stack b256 = 120 ms, extract b8 = 21.9 ms)
    measure("gstack-seg-k100-b256", "gstack", 100, 256)
    measure("gstack-seg-k100-b8", "gstack", 100, 8)
    # k=10 control: segmented gstack vs extract (the current auto choice)
    measure("gstack-seg-k10-b256", "gstack", 10, 256)
    measure("extract-k10-b256", "extract", 10, 256)


if __name__ == "__main__":
    main()
