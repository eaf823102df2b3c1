"""k=100 regime alternatives on the real TPU (canonical 1000x10000x256):

  a) current fused kernel: stack / extract / insert selections
  b) XLA path: normalize + matmul -> materialized (m, n) scores -> lax.top_k
  c) lax.top_k alone on resident scores (selection floor)
  d) jax.lax.approx_max_k at recall 0.95 / aggregate-to-exact
  e) matmul alone (compute floor)
"""
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
    cn = c / jnp.linalg.norm(c, axis=1, keepdims=True)
    jax.block_until_ready((q, c, cn))
    K = 100

    def bench(tag, step, x=q):
        t0 = time.time()
        try:
            t = device_step_seconds(step, x, chain_lo=8, chain_hi=120,
                                    iters=5)
        except Exception as e:
            print(json.dumps({"tag": tag, "error": str(e)[:160]}),
                  flush=True)
            return
        print(json.dumps({"tag": tag, "device_ms": round(t * 1e3, 4),
                          "wall_s": round(time.time() - t0, 1)}),
              flush=True)

    # e) matmul floor
    def mm(qq):
        qn = qq / jnp.linalg.norm(qq, axis=1, keepdims=True)
        s = jax.lax.dot_general(
            qn, cn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jnp.max(s, axis=1, keepdims=True)

    bench("matmul-only", mm)

    # b) XLA end-to-end
    def xla_full(qq):
        qn = qq / jnp.linalg.norm(qq, axis=1, keepdims=True)
        s = jax.lax.dot_general(
            qn, cn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        v, i = jax.lax.top_k(s, K)
        return v[:, -1:] + i[:, -1:].astype(jnp.float32)

    bench("xla-matmul+topk-k100", xla_full)

    # c) top_k alone on resident scores
    s_res = jax.block_until_ready(
        jax.jit(lambda qq: jax.lax.dot_general(
            qq, cn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))(q))

    def topk_only(ss):
        v, i = jax.lax.top_k(ss, K)
        return v[:, -1:] + i[:, -1:].astype(jnp.float32)

    bench("lax.top_k-only-k100", topk_only, s_res)

    def topk_only_k10(ss):
        v, i = jax.lax.top_k(ss, 10)
        return v[:, -1:] + i[:, -1:].astype(jnp.float32)

    bench("lax.top_k-only-k10", topk_only_k10, s_res)

    # d) approx_max_k
    def approx(qq):
        qn = qq / jnp.linalg.norm(qq, axis=1, keepdims=True)
        s = jax.lax.dot_general(
            qn, cn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        v, i = jax.lax.approx_max_k(s, K, recall_target=0.95)
        return v[:, -1:] + i[:, -1:].astype(jnp.float32)

    bench("approx_max_k-0.95", approx)

    def approx_exact(qq):
        qn = qq / jnp.linalg.norm(qq, axis=1, keepdims=True)
        s = jax.lax.dot_general(
            qn, cn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        v, i = jax.lax.approx_max_k(
            s, K, recall_target=0.95, aggregate_to_topk=True)
        return v[:, -1:] + i[:, -1:].astype(jnp.float32)

    bench("approx_max_k-agg", approx_exact)

    # a) fused kernel selections at k=100
    for sel in ("insert", "stack", "extract"):
        cfg = SearchConfig(selection=sel)

        def step(qq, cfg=cfg):
            v, _ = fused_topk(qq, c, K, "cosine", config=cfg)
            return jnp.max(v, axis=1, keepdims=True)

        bench(f"fused-{sel}-k100", step)

    # use_pallas=False dispatcher path for reference
    cfgx = SearchConfig(use_pallas=False)

    def xstep(qq):
        v, _ = fused_topk(qq, c, K, "cosine", config=cfgx)
        return jnp.max(v, axis=1, keepdims=True)

    bench("dispatch-xla-k100", xstep)


if __name__ == "__main__":
    main()
