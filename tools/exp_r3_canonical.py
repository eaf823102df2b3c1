"""Round-3 canonical-workload measurements on the real TPU.

1. gpop (gstack build + in-kernel k-pop finish) at k in {10, 16} on the
   canonical 1000x10000x256d f32 cosine workload, vs bucket (the round-2
   auto choice) — VERDICT r02 item 1 (headline <= 0.20 ms).
2. k=100 with the approx_max_k(recall_target=1.0) XLA finish —
   VERDICT r02 item 4 (<= 0.40 ms).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_r3_canonical.py
"""
import json

import numpy as np
import jax
import jax.numpy as jnp

import polars_matmul_tpu  # noqa: F401
from polars_matmul_tpu.config import SearchConfig
from polars_matmul_tpu.kernels.fused_topk import fused_topk
from polars_matmul_tpu.utils.autotune import device_step_seconds


def main():
    assert jax.default_backend() == "tpu"
    M, N, DIM = 1000, 10_000, 256
    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.standard_normal((M, DIM)), dtype=jnp.float32)
    c = jnp.asarray(rng.standard_normal((N, DIM)), dtype=jnp.float32)
    jax.block_until_ready((q, c))

    def measure(k, sel, repeats=3):
        cfg = SearchConfig(selection=sel)

        def step(qq):
            v, _ = fused_topk(qq, c, k, "cosine", config=cfg)
            return jnp.max(v, axis=1, keepdims=True)

        ts = [device_step_seconds(step, q, chain_lo=8, chain_hi=136,
                                  iters=3) * 1e3
              for _ in range(repeats)]
        print(json.dumps({"k": k, "selection": sel,
                          "ms": [round(t, 4) for t in ts]}), flush=True)

    measure(16, "gpop")
    measure(10, "gpop")
    measure(100, "gstack")   # approx_max_k finish
    measure(10, "bucket", repeats=2)


if __name__ == "__main__":
    main()
