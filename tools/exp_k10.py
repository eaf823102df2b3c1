"""Round-3 selection sweep at k <= 16 on the canonical workload.

VERDICT r02 item 1: the headline k=10 kernel regressed (0.275 -> 0.328 ms)
and bucket's measured band is +-60%; gstack was never measured at k <= 16.
This sweep measures every selection strategy at k in {1, 10, 16} on the
canonical 1000x10000x256d f32 cosine workload, with REPEATS so the
run-to-run spread is part of the record, and prints a regime table for
_resolve_selection.

Run on the real TPU:  python tools/exp_k10.py
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import polars_matmul_tpu  # noqa: F401
from polars_matmul_tpu.config import SearchConfig
from polars_matmul_tpu.kernels.fused_topk import fused_topk
from polars_matmul_tpu.utils.autotune import device_step_seconds

M, N, DIM = 1000, 10_000, 256
REPEATS = 5


def measure(k: int, selection: str, prune: str = "auto",
            m: int = M) -> list:
    cfg = SearchConfig(selection=selection, prune=prune)
    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.standard_normal((m, DIM)), dtype=jnp.float32)
    c = jnp.asarray(rng.standard_normal((N, DIM)), dtype=jnp.float32)
    jax.block_until_ready((q, c))

    def step(qq):
        v, _ = fused_topk(qq, c, k, "cosine", config=cfg)
        return jnp.max(v, axis=1, keepdims=True)

    out = []
    for _ in range(REPEATS):
        t = device_step_seconds(step, q, chain_lo=8, chain_hi=136, iters=4)
        out.append(t * 1e3)
    return out


def main():
    assert jax.default_backend() == "tpu", "run on the real TPU"
    rows = []
    for k in (1, 10, 16):
        for sel in ("gpop", "bucket", "extract", "gstack"):
            ts = measure(k, sel)
            rows.append({
                "k": k, "selection": sel,
                "ms_min": round(min(ts), 4),
                "ms_med": round(sorted(ts)[len(ts) // 2], 4),
                "ms_max": round(max(ts), 4),
                "runs": [round(t, 4) for t in ts],
            })
            print(json.dumps(rows[-1]), flush=True)
    # m=1024 control: no padded query rows at all (isolates the detection
    # masking fix from any residual pad-row effect)
    for sel in ("gpop", "bucket"):
        ts = measure(10, sel, m=1024)
        print(json.dumps({"k": 10, "selection": sel, "m": 1024,
                          "ms_min": round(min(ts), 4),
                          "ms_med": round(sorted(ts)[len(ts) // 2], 4),
                          "ms_max": round(max(ts), 4)}), flush=True)


if __name__ == "__main__":
    main()
