"""Big-corpus (2M x 256d) regimes with round-2 selections on the TPU:
auto(bucket) vs extract at k=10 across batch sizes; k=100 for the record.
Checks the ARCHITECTURE prune numbers still hold under the new defaults.
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
    from polars_matmul_tpu.utils.autotune import device_step_seconds

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

    # Closure-captured device arrays are inlined as jit CONSTANTS (a 2 GB
    # program breaks the remote-compile pipe), so the chain passes the
    # prepared corpus as ARGUMENTS — mirroring the Corpus serving path.
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

    for sel in ("bucket", "extract"):
        measure(f"{sel}-k10-b8", sel, 10, 8)
        measure(f"{sel}-k10-b256", sel, 10, 256)
    measure("extract-k100-b256", "extract", 100, 256)
    measure("extract-k100-b8", "extract", 100, 8)
    measure("stack-k100-b256", "stack", 100, 256)


if __name__ == "__main__":
    main()
