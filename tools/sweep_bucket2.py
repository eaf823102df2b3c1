"""Measure the round-2 bucket (static fallback, 256 classes) on the TPU."""
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

    # correctness spot-check on the real TPU before timing
    qs = np.asarray(q[:64])
    cs = np.asarray(c)
    v, i = fused_topk(q[:64], c, 10, "cosine",
                      config=SearchConfig(selection="bucket"))
    qn = qs / np.linalg.norm(qs, axis=1, keepdims=True)
    cn = cs / np.linalg.norm(cs, axis=1, keepdims=True)
    s = qn.astype(np.float64) @ cn.astype(np.float64).T
    ref_i = np.argsort(-s, axis=1, kind="stable")[:, :10]
    ref_v = np.take_along_axis(s, ref_i, 1)
    assert np.allclose(np.asarray(v), ref_v, rtol=1e-4, atol=1e-5), "scores"
    mism = np.asarray(i) != ref_i
    assert np.all(np.abs(np.asarray(v))[mism] - np.abs(ref_v[mism])
                  <= 1e-5 + 1e-4 * np.abs(ref_v[mism])), "indices"
    print(json.dumps({"tag": "correctness", "ok": True}), flush=True)

    for tag, cfg, k in [
        ("bucket-k10-pruneauto", SearchConfig(selection="bucket"), 10),
        ("bucket-k10-pruneoff",
         SearchConfig(selection="bucket", prune="off"), 10),
        ("bucket-k16", SearchConfig(selection="bucket"), 16),
        ("auto-k10", SearchConfig(), 10),
        ("bucket-k100", SearchConfig(selection="bucket"), 100),
    ]:
        def step(qq, cfg=cfg, k=k):
            v, _ = fused_topk(qq, c, k, "cosine", config=cfg)
            return jnp.max(v, axis=1, keepdims=True)

        t0 = time.time()
        try:
            t = device_step_seconds(step, q, chain_lo=8, chain_hi=120,
                                    iters=5)
        except Exception as e:
            print(json.dumps({"tag": tag, "error": str(e)[:200]}),
                  flush=True)
            continue
        print(json.dumps({"tag": tag, "k": k,
                          "device_ms": round(t * 1e3, 4),
                          "wall_s": round(time.time() - t0, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
