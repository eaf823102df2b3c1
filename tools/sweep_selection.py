"""Selection-strategy sweep on the live TPU (round-2 perf work).

Measures device-only time of the fused top-k kernel across selection
strategies / prune modes / tile geometries at k=10 and k=100 on the
canonical 1000x10000x256 f32 cosine workload (BASELINE.md), using the
same chain-differencing timer as bench.py.  Prints one JSON line per
candidate (flushed immediately — compiles are slow) and a final summary.

Usage: python tools/sweep_selection.py [preset]
  preset: "canonical" (default), "big" (2M-corpus batch regime), "all"
"""

import json
import sys
import time

import numpy as np


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "canonical"

    import jax
    import jax.numpy as jnp

    import polars_matmul_tpu  # noqa: F401
    from polars_matmul_tpu.config import SearchConfig
    from polars_matmul_tpu.kernels.fused_topk import fused_topk
    from polars_matmul_tpu.utils.autotune import device_step_seconds

    assert jax.default_backend() == "tpu", "sweep needs the real TPU"

    rng = np.random.default_rng(42)

    def run_workload(name, m, n, dim, cands, iters=5, chain=(8, 120)):
        q = jnp.asarray(rng.standard_normal((m, dim)), dtype=jnp.float32)
        c = jnp.asarray(rng.standard_normal((n, dim)), dtype=jnp.float32)
        jax.block_until_ready((q, c))
        results = []
        for cand in cands:
            k = cand.pop("k")
            cfg = SearchConfig(**cand)
            label = dict(cand, k=k)

            def step(qq, cfg=cfg, k=k):
                v, _ = fused_topk(qq, c, k, "cosine", config=cfg)
                return jnp.max(v, axis=1, keepdims=True)

            t0 = time.time()
            try:
                t = device_step_seconds(
                    step, q, chain_lo=chain[0], chain_hi=chain[1],
                    iters=iters)
            except Exception as e:
                print(json.dumps({"workload": name, **label,
                                  "error": str(e)[:200]}), flush=True)
                continue
            rec = {"workload": name, **label,
                   "device_ms": round(t * 1e3, 4),
                   "wall_s": round(time.time() - t0, 1)}
            print(json.dumps(rec), flush=True)
            results.append(rec)
        return results

    all_results = []
    if preset in ("canonical", "all"):
        cands10 = [
            dict(k=10, selection="extract", prune="auto"),
            dict(k=10, selection="insert", prune="auto"),
            dict(k=10, selection="bucket", prune="auto"),
            dict(k=10, selection="bucket", prune="off"),
            dict(k=10, selection="extract", prune="off"),
        ]
        cands100 = [
            dict(k=100, selection="extract", prune="auto"),
            dict(k=100, selection="insert", prune="auto"),
            dict(k=100, selection="bucket", prune="auto"),
            dict(k=100, selection="bucket", prune="off"),
        ]
        all_results += run_workload("1000x10000x256", 1000, 10_000, 256,
                                    cands10 + cands100)
    if preset in ("big", "all"):
        # Batch-serving regime: 256 queries vs a 1M-row corpus.
        candsb = [
            dict(k=10, selection="extract", prune="auto"),
            dict(k=10, selection="insert", prune="auto"),
            dict(k=10, selection="bucket", prune="auto"),
            dict(k=100, selection="extract", prune="auto"),
            dict(k=100, selection="insert", prune="auto"),
            dict(k=100, selection="bucket", prune="auto"),
        ]
        all_results += run_workload("256x1M x256", 256, 1_000_000, 256,
                                    candsb, iters=3, chain=(4, 24))

    by_wk = {}
    for r in all_results:
        key = (r["workload"], r["k"])
        if key not in by_wk or r["device_ms"] < by_wk[key]["device_ms"]:
            by_wk[key] = r
    print("WINNERS:", flush=True)
    for key, r in sorted(by_wk.items(), key=str):
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
