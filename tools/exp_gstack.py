"""gstack vs stack vs extract on the real TPU (canonical workload)."""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import polars_matmul_tpu  # noqa: F401
    from polars_matmul_tpu.config import SearchConfig
    from polars_matmul_tpu.kernels.fused_topk import fused_topk
    from polars_matmul_tpu.utils.autotune import device_step_seconds

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.standard_normal((1000, 256)), dtype=jnp.float32)
    c = jnp.asarray(rng.standard_normal((10_000, 256)), dtype=jnp.float32)
    jax.block_until_ready((q, c))

    # hardware correctness first: k=100 gstack vs NumPy oracle
    cfgG = SearchConfig(selection="gstack")
    v, i = fused_topk(q[:128], c, 100, "cosine", config=cfgG)
    qs, cs = np.asarray(q[:128]), np.asarray(c)
    qn = qs / np.linalg.norm(qs, axis=1, keepdims=True)
    cn = cs / np.linalg.norm(cs, axis=1, keepdims=True)
    s = qn.astype(np.float64) @ cn.astype(np.float64).T
    ri = np.argsort(-s, axis=1, kind="stable")[:, :100]
    rv = np.take_along_axis(s, ri, 1)
    assert np.allclose(np.asarray(v), rv, rtol=2e-4, atol=2e-5), "scores"
    mism = np.asarray(i) != ri
    assert np.all(np.abs(np.asarray(v)[mism] - rv[mism])
                  <= 3e-5 + 2e-4 * np.abs(rv[mism])), "indices"
    print(json.dumps({"tag": "tpu-correctness-gstack-k100", "ok": True}),
          flush=True)

    def measure(tag, sel, k, bq=None, bn=None):
        kw = {}
        if bq:
            kw = dict(block_q=bq, block_n=bn, auto_tile=False)
        cfg = SearchConfig(selection=sel, **kw)

        def step(qq):
            v, _ = fused_topk(qq, c, k, "cosine", config=cfg)
            return jnp.max(v, axis=1, keepdims=True)

        t0 = time.time()
        try:
            t = device_step_seconds(step, q, chain_lo=8, chain_hi=120,
                                    iters=5)
        except Exception as e:
            print(json.dumps({"tag": tag, "error": str(e)[:200]}),
                  flush=True)
            return
        print(json.dumps({"tag": tag, "k": k,
                          "device_ms": round(t * 1e3, 4),
                          "wall_s": round(time.time() - t0, 1)}),
              flush=True)

    for rnd in range(2):
        measure(f"gstack-k100-r{rnd}", "gstack", 100)
        measure(f"gstack-k100-bq256-r{rnd}", "gstack", 100, 256, 2048)
        measure(f"gstack-k32-r{rnd}", "gstack", 32)
        measure(f"gstack-k10-r{rnd}", "gstack", 10)
        if rnd == 0:
            measure("stack-k100", "stack", 100)
            measure("extract-k100", "extract", 100)


if __name__ == "__main__":
    main()
