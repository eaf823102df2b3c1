"""Within-process A/B: stack vs extract vs bucket at k in {10, 100}."""
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

    # correctness spot-check on hardware first (k=100, stack)
    cfgS = SearchConfig(selection="stack")
    v, i = fused_topk(q[:64], c, 100, "cosine", config=cfgS)
    qs, cs = np.asarray(q[:64]), np.asarray(c)
    qn = qs / np.linalg.norm(qs, axis=1, keepdims=True)
    cn = cs / np.linalg.norm(cs, axis=1, keepdims=True)
    s = qn.astype(np.float64) @ cn.astype(np.float64).T
    ri = np.argsort(-s, axis=1, kind="stable")[:, :100]
    rv = np.take_along_axis(s, ri, 1)
    assert np.allclose(np.asarray(v), rv, rtol=1e-4, atol=1e-5), "scores"
    mism = np.asarray(i) != ri
    assert np.all(np.abs(np.asarray(v)[mism] - rv[mism])
                  <= 1e-5 + 1e-4 * np.abs(rv[mism])), "indices"
    print(json.dumps({"tag": "tpu-correctness-k100", "ok": True}),
          flush=True)

    def measure(tag, sel, k):
        cfg = SearchConfig(selection=sel)

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
        measure(f"extract-k100-r{rnd}", "extract", 100)
        measure(f"stack-k100-r{rnd}", "stack", 100)
        measure(f"stack-k10-r{rnd}", "stack", 10)
        measure(f"bucket-k10-r{rnd}", "bucket", 10)
        measure(f"stack-k32-r{rnd}", "stack", 32)
        measure(f"extract-k32-r{rnd}", "extract", 32)


if __name__ == "__main__":
    main()
