"""Isolate the cost of the bucket fallback's pl.when regions (throwaway)."""
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

    def measure(tag, k=10, iters=5):
        cfg = SearchConfig(selection="bucket", prune="off")

        def step(qq):
            v, _ = FT.fused_topk(qq, c, k, "cosine", config=cfg)
            return jnp.max(v, axis=1, keepdims=True)

        t0 = time.time()
        t = device_step_seconds(step, q, chain_lo=8, chain_hi=120,
                                iters=iters)
        print(json.dumps({"tag": tag, "k": k,
                          "device_ms": round(t * 1e3, 4),
                          "wall_s": round(time.time() - t0, 1)}),
              flush=True)

    orig = FT._select_bucket

    def bucket_noregions(s, carry_vals, carry_idx, extract_fb, n_base, k,
                         kp, tm, block_n):
        cw = FT._bucket_class_width(block_n)
        groups = block_n // cw
        lane = jax.lax.broadcasted_iota(jnp.int32, (tm, cw), 1)
        cv = carry_vals[:]
        ci = carry_idx[:]
        m1, p1, m2, p2, m3 = FT._bucket_top3(s, tm, groups, cw)
        cand_v = jnp.concatenate([m1, m2], axis=1)
        cand_i = jnp.concatenate(
            [n_base + p1 * cw + lane, n_base + p2 * cw + lane], axis=1)
        nv, ni = FT._merge_narrow(cv, ci, cand_v, cand_i, k, kp, tm)
        # keep the detection ops live but commit unconditionally
        kth = nv[:, k - 1:k]
        bad = jnp.max(jnp.where((m3 > FT._NEG_INF) & (m3 >= kth),
                                1, 0).astype(jnp.int32))
        carry_vals[:] = nv + jnp.float32(0) * bad
        carry_idx[:] = ni

    def bucket_cw128(s, carry_vals, carry_idx, extract_fb, n_base, k,
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

    def bucket_lightregion(s, carry_vals, carry_idx, extract_fb, n_base,
                           k, kp, tm, block_n):
        """Regions present but the fallback body is TRIVIAL — separates
        region-entry cost from fallback-body scheduling cost."""
        cw = FT._bucket_class_width(block_n)
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
            carry_vals[:] = cv  # wrong values; timing only
            carry_idx[:] = ci

    for tag, fn in [("noregions-cw256", bucket_noregions),
                    ("regions-cw128", bucket_cw128),
                    ("lightregion-cw256", bucket_lightregion)]:
        FT._select_bucket = fn
        try:
            measure(tag)
        except Exception as e:
            print(json.dumps({"tag": tag, "error": str(e)[:200]}),
                  flush=True)
        finally:
            FT._select_bucket = orig


if __name__ == "__main__":
    main()
