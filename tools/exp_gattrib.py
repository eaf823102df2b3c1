"""Attribute gstack v2 cost on TPU: kernel-only vs +top_k vs +cond."""
import importlib
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import polars_matmul_tpu  # noqa: F401
    from polars_matmul_tpu.config import SearchConfig
    from polars_matmul_tpu.utils.autotune import device_step_seconds

    FT = importlib.import_module("polars_matmul_tpu.kernels.fused_topk")

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.standard_normal((1000, 256)), dtype=jnp.float32)
    c = jnp.asarray(rng.standard_normal((10_000, 256)), dtype=jnp.float32)
    jax.block_until_ready((q, c))

    def measure(tag, k):
        cfg = SearchConfig(selection="gstack")
        FT._fused_topk_f32.clear_cache()

        def step(qq):
            v, _ = FT.fused_topk(qq, c, k, "cosine", config=cfg)
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

    orig = FT._gstack_decode

    # A) full path (cond may fire)
    measure("full-k100", 100)

    # B) bad pinned False -> cond never fires (isolates fallback firing)
    def no_bad(u_panel, k, total_groups, low_mask, depth, n_levels):
        vals, idx, _ = orig(u_panel, k, total_groups, low_mask, depth,
                            n_levels)
        return vals, idx, jnp.zeros((), jnp.bool_)

    FT._gstack_decode = no_bad
    measure("nobad-k100", 100)
    measure("nobad-k10", 10)

    # C) skip top_k entirely -> kernel (matmul+build+panel write) only
    def raw_panel(u_panel, k, total_groups, low_mask, depth, n_levels):
        vals = u_panel[:, :k].astype(jnp.float32)
        idx = u_panel[:, :k]
        return vals, idx, jnp.zeros((), jnp.bool_)

    FT._gstack_decode = raw_panel
    measure("kernelonly-k100", 100)
    FT._gstack_decode = orig


if __name__ == "__main__":
    main()
