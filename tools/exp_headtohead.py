"""Head-to-head: real _select_bucket vs inline copy, interleaved, 2 rounds.
Settles whether the 0.194-vs-0.30 discrepancy is code or measurement."""
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
    from jax.experimental import pallas as pl

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.standard_normal((1000, 256)), dtype=jnp.float32)
    c = jnp.asarray(rng.standard_normal((10_000, 256)), dtype=jnp.float32)
    jax.block_until_ready((q, c))

    def measure(tag, sel="bucket", k=10):
        cfg = SearchConfig(selection=sel, prune="off")

        def step(qq):
            v, _ = FT.fused_topk(qq, c, k, "cosine", config=cfg)
            return jnp.max(v, axis=1, keepdims=True)

        t0 = time.time()
        t = device_step_seconds(step, q, chain_lo=8, chain_hi=120, iters=5)
        print(json.dumps({"tag": tag,
                          "device_ms": round(t * 1e3, 4),
                          "wall_s": round(time.time() - t0, 1)}),
              flush=True)

    orig = FT._select_bucket

    def bucket_copy(s, carry_vals, carry_idx, extract_fb, n_base, k,
                    kp, tm, block_n):
        cw = FT._LANES
        groups = block_n // cw
        lane = jax.lax.broadcasted_iota(jnp.int32, (tm, cw), 1)
        cv = carry_vals[:]
        ci = carry_idx[:]
        m1, p1, m2, p2, m3 = FT._bucket_top3(s, tm, groups, cw)
        cand_v = jnp.concatenate([m1, m2], axis=1)
        cand_i = jnp.concatenate(
            [n_base + p1 * cw + lane, n_base + p2 * cw + lane], axis=1)
        nv, ni = FT._merge_narrow(cv, ci, cand_v, cand_i, k, kp, tm)
        kth = nv[:, k - 1:k]
        bad = jnp.max(jnp.where((m3 > FT._NEG_INF) & (m3 >= kth),
                                1, 0).astype(jnp.int32))

        @pl.when(bad == 0)
        def _():
            carry_vals[:] = nv
            carry_idx[:] = ni

        @pl.when(bad != 0)
        def _():
            extract_fb(s, cv, ci)

    for rnd in range(2):
        measure(f"real-r{rnd}")
        FT._select_bucket = bucket_copy
        try:
            measure(f"copy-r{rnd}")
        finally:
            FT._select_bucket = orig
        measure(f"extract-r{rnd}", sel="extract")


if __name__ == "__main__":
    main()
