"""Kernel time attribution experiments (round-2 perf work, throwaway).

Monkeypatches pieces of the fused kernel to attribute device time:
  noop      — selection returns the carry unchanged (matmul+epilogue floor)
  nobucket  — bucket without the exactness repair loop
  nomerge   — bucket reduce only, merge skipped
  k-slope   — extract at k = 1, 2, 4, 10 (per-extraction cost)

Results are TIMING ONLY (noop/nomerge return wrong values by design).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import importlib

    import polars_matmul_tpu  # noqa: F401
    from polars_matmul_tpu.config import SearchConfig

    # the kernels package re-exports the fused_topk FUNCTION under the
    # module's name; import the module itself for monkeypatching
    FT = importlib.import_module("polars_matmul_tpu.kernels.fused_topk")
    from polars_matmul_tpu.utils.autotune import device_step_seconds

    assert jax.default_backend() == "tpu"

    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.standard_normal((1000, 256)), dtype=jnp.float32)
    c = jnp.asarray(rng.standard_normal((10_000, 256)), dtype=jnp.float32)
    jax.block_until_ready((q, c))

    def measure(tag, cfg, k=10, iters=5):
        def step(qq):
            v, _ = FT.fused_topk(qq, c, k, "cosine", config=cfg)
            return jnp.max(v, axis=1, keepdims=True)

        t0 = time.time()
        try:
            t = device_step_seconds(step, q, chain_lo=8, chain_hi=120,
                                    iters=iters)
        except Exception as e:
            print(json.dumps({"tag": tag, "error": str(e)[:200]}),
                  flush=True)
            return
        print(json.dumps({"tag": tag, "k": k,
                          "device_ms": round(t * 1e3, 4),
                          "wall_s": round(time.time() - t0, 1)}),
              flush=True)

    orig_extract = FT._select_extract
    orig_bucket = FT._select_bucket

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "noop"):
        # selection floor: matmul + epilogue + carry write only
        FT._select_extract = (
            lambda s, cv, ci, lane, nb, k, kp, tm: (cv, ci))
        try:
            measure("noop-selection", SearchConfig(selection="extract",
                                                   prune="off"))
        finally:
            FT._select_extract = orig_extract

    if which in ("all", "kslope"):
        for k in (1, 2, 4, 10, 16):
            measure(f"extract-k{k}",
                    SearchConfig(selection="extract", prune="off"), k=k)

    if which in ("all", "bucket"):
        def bucket_norepair(s, cv, ci, lane, nb, k, kp, tm, groups):
            m1, p1, m2, p2, m3 = FT._bucket_top3(s, tm, groups)
            cand_v = jnp.concatenate([m1, m2], axis=1)
            cand_i = jnp.concatenate(
                [nb + p1 * FT._LANES + lane, nb + p2 * FT._LANES + lane],
                axis=1)
            return FT._merge_narrow(cv, ci, cand_v, cand_i, k, kp, tm)

        def bucket_nomerge(s, cv, ci, lane, nb, k, kp, tm, groups):
            m1, p1, m2, p2, m3 = FT._bucket_top3(s, tm, groups)
            # fold the reduce outputs into the carry cheaply (wrong
            # values, right data deps) so nothing is dead-code-eliminated
            cv = cv + m1[:, :1] * 1e-30 + m2[:, :1] * 1e-30 \
                + m3[:, :1] * 1e-30
            ci = ci + (p1[:, :1] - p2[:, :1]) * 0
            return cv, ci

        FT._select_bucket = bucket_norepair
        try:
            measure("bucket-norepair", SearchConfig(selection="bucket",
                                                    prune="off"))
        finally:
            FT._select_bucket = orig_bucket
        FT._select_bucket = bucket_nomerge
        try:
            measure("bucket-nomerge", SearchConfig(selection="bucket",
                                                   prune="off"))
        finally:
            FT._select_bucket = orig_bucket

    if which in ("all", "k100"):
        for sel in ("extract",):
            measure(f"{sel}-k100", SearchConfig(selection=sel,
                                                prune="off"), k=100)


if __name__ == "__main__":
    main()
