"""Finish-variant race on NORTH-STAR panel shapes (round 5).

The 10M x 768 segmented gstack emits (256, n_segs*lv*128) u panels:
k=100 fast pass reads (256, 160000), k=10 reads (256, 160000) of a
(256, 240000) panel.  dense8 r5 showed k=10 b256 REGRESSED 55.5 ->
70.6 ms after the chunked tree landed — the suspect is per-chunk
lax.top_k (the k <= 16 reduce) on 3D operands.  Race flat/chunked x
top_k/approx on the real shapes, plus the u->f transform cost of
slicing the fast levels before vs after the elementwise pass.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_finish2.py
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from polars_matmul_tpu.kernels.fused_topk import _chunked_top_k


def chain(step, q, extra=(), lo=2, hi=8, iters=3):
    def chained(n):
        @jax.jit
        def f(qq, t, *ex):
            qq = qq + t

            def body(i, qq):
                return qq + step(qq, *ex) * 1e-30

            return jax.lax.fori_loop(0, n, body, qq)[0, 0]

        return f

    f_lo, f_hi = chained(lo), chained(hi)
    tick = [0.0]

    def run(g):
        tick[0] += 1e-7
        t0 = time.time()
        float(np.asarray(g(q, jnp.float32(tick[0]), *extra)))
        return time.time() - t0

    run(f_lo), run(f_hi)
    a = min(run(f_lo) for _ in range(iters))
    b = min(run(f_hi) for _ in range(iters))
    return (b - a) / (hi - lo) * 1e3


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(5)
    M = 256
    qj = jax.block_until_ready(
        jnp.asarray(rng.standard_normal((M, 8)).astype(np.float32)))

    for W, k in ((160_000, 100), (160_000, 10), (240_000, 10),
                 (320_000, 100)):
        panel = jax.block_until_ready(jnp.asarray(
            rng.standard_normal((M, W)).astype(np.float32)))

        def couple(qq, p):
            return p + qq[:, :1]

        def f_flat_topk(qq, p):
            v, _ = jax.lax.top_k(couple(qq, p), k)
            return jnp.max(v, axis=1, keepdims=True)

        def f_flat_approx(qq, p):
            v, _ = jax.lax.approx_max_k(couple(qq, p), k,
                                        recall_target=1.0)
            return jnp.max(v, axis=1, keepdims=True)

        def f_chunked(qq, p):
            v, _ = _chunked_top_k(couple(qq, p), k)
            return jnp.max(v, axis=1, keepdims=True)

        def f_chunked_approx(qq, p):
            # chunked tree but approx_max_k at every stage even at
            # k <= 16 (the shipped helper switches to top_k there)
            pc = couple(qq, p)
            nch = W // 2048
            v1, s1 = jax.lax.approx_max_k(
                pc.reshape(M, nch, 2048), k, recall_target=1.0)
            v2, s2 = jax.lax.approx_max_k(
                v1.reshape(M, nch * k), k, recall_target=1.0)
            return jnp.max(v2, axis=1, keepdims=True)

        for tag, fn in (("flat-topk", f_flat_topk),
                        ("flat-approx", f_flat_approx),
                        ("chunked(shipped)", f_chunked),
                        ("chunked-approx", f_chunked_approx)):
            try:
                ms = chain(fn, qj, extra=(panel,))
            except Exception as e:  # top_k may OOM/slow-lower at width
                print(json.dumps({"tag": f"W{W}-k{k}-{tag}",
                                  "error": str(e)[:90]}), flush=True)
                continue
            print(json.dumps({"tag": f"W{W}-k{k}-{tag}",
                              "ms": round(ms, 3)}), flush=True)
        del panel


if __name__ == "__main__":
    main()
