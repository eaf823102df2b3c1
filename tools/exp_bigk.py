"""Round-4 big-k measurements: 128 < k <= 1024 on the fused path.

The round-4 extension serves big k without the XLA fallback's dense
(m, n) score matrix: dense pow2 scans run gstack with binomial-tail
stack depths and the ceil(k/128)-level prune gate; the carry/output
width auto-raises in 128-lane groups (kernels/fused_topk.py::
effective_k_pad, _bigk_depth).

Stages (own process each, tunnel-stall isolation):
  canonical   1000 x 10,000 x 256d f32 cosine, k in {256, 512, 1024}:
              fused (auto->gstack) vs the XLA fallback path
  bigcorpus   2M x 256d f32 cosine, k in {256, 512}, batch {8, 256}:
              fused segmented gstack (the XLA path would build a
              0.25-2 GB score panel per batch)

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_bigk.py <stage>
"""
import json
import sys
import time

import numpy as np


def chain_ms(fn_step, q, extra=(), chain_lo=8, chain_hi=104, iters=5):
    """``extra``: device operands passed as REAL jit arguments — closing
    over a multi-GB prepared corpus bakes it into each executable as a
    lowering constant, which stalls the RPC tunnel for minutes."""
    import jax
    import jax.numpy as jnp

    def chained(n):
        @jax.jit
        def f(qq, t, *ex):
            qq = qq + t

            def body(i, qq):
                return qq + fn_step(qq, *ex) * 1e-30

            return jax.lax.fori_loop(0, n, body, qq)[0, 0]

        return f

    f_lo, f_hi = chained(chain_lo), chained(chain_hi)
    tick = [0.0]

    def run(g):
        tick[0] += 1e-7
        t0 = time.time()
        float(np.asarray(g(q, jnp.float32(tick[0]), *extra)))
        return time.time() - t0

    run(f_lo), run(f_hi)  # compile
    lo = min(run(f_lo) for _ in range(iters))
    hi = min(run(f_hi) for _ in range(iters))
    return (hi - lo) / (chain_hi - chain_lo) * 1e3


def stage_canonical():
    import jax
    import jax.numpy as jnp
    import polars_matmul_tpu as pmt
    from polars_matmul_tpu.kernels.fused_topk import (_bigk_depth,
                                                      fused_topk)

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((1000, 256)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((10_000, 256)), jnp.float32)
    jax.block_until_ready((q, c))
    for k in (256, 512, 1024):
        for label, cfg in (
            ("fused", pmt.SearchConfig()),
            ("xla", pmt.SearchConfig(use_pallas=False)),
        ):
            def step(qq, k=k, cfg=cfg):
                v, _ = fused_topk(qq, c, k, "cosine", config=cfg)
                return jnp.max(v, axis=1, keepdims=True)

            ms = chain_ms(step, q)
            out = {"tag": f"canonical-k{k}-{label}",
                   "device_ms": round(ms, 3)}
            if label == "fused":
                out["levels"] = _bigk_depth(k, 128)
            print(json.dumps(out), flush=True)


def stage_bigcorpus():
    import jax
    import jax.numpy as jnp
    import polars_matmul_tpu as pmt
    from polars_matmul_tpu.kernels.fused_topk import fused_topk_prepared
    from polars_matmul_tpu.ops.metrics import Metric

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(8)
    n, dim = 2_000_000, 256
    c = rng.standard_normal((n, dim)).astype(np.float32)
    corpus = pmt.Corpus(c)
    del c
    q = rng.standard_normal((256, dim)).astype(np.float32)
    for k in (256, 512):
        cp, cbp, tn = corpus._prepared_for(Metric.parse("cosine"), k)
        cp, cbp = jax.block_until_ready((cp, cbp))
        cfg = corpus.config
        for m in (8, 256):
            qj = jax.block_until_ready(jnp.asarray(q[:m]))

            def step(qq, cpx, cbx, k=k):
                v, _ = fused_topk_prepared(qq, cpx, cbx, k, "cosine",
                                           tn=tn, config=cfg)
                return jnp.max(v, axis=1, keepdims=True)

            ms = chain_ms(step, qj, extra=(cp, cbp))
            print(json.dumps({
                "tag": f"2M-k{k}-b{m}", "device_ms": round(ms, 3),
                "xla_panel_gb": round(m * n * 4 / 1e9, 2),
            }), flush=True)


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "canonical"
    if stage == "canonical":
        stage_canonical()
    elif stage == "bigcorpus":
        stage_bigcorpus()
    else:
        raise SystemExit(f"unknown stage {stage}")


if __name__ == "__main__":
    main()
