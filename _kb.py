import time
import numpy as np
import jax
import jax.numpy as jnp
from polars_matmul_tpu.kernels.fused_topk import (
    fused_topk_prepared, prepare_corpus, corpus_tile_rows)
from polars_matmul_tpu.config import SearchConfig

M, N, D = 256, 1_250_000, 768
rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.standard_normal((M, D)), dtype=jnp.float32)
c = rng.standard_normal((N, D)).astype(np.float32)
cfg = SearchConfig()
tn = corpus_tile_rows(D, cfg)
with jax.enable_x64(False):
    prep = jax.jit(lambda c: prepare_corpus(c, "cosine", tn=tn, precision=cfg.precision))
    cp, cbp = jax.block_until_ready(prep(jnp.asarray(c)))
del c
print("prepared:", cp.shape, cp.dtype, "tn =", tn, flush=True)

C1, C2 = 2, 12
_t = [0.0]

def make_chain(k, chain):
    @jax.jit
    def f(q, t):
        q = q + t
        def body(i, q):
            v, _ = fused_topk_prepared(q, cp, cbp, k, "cosine", config=cfg)
            return q + jnp.max(v, axis=1, keepdims=True) * 1e-30
        return jax.lax.fori_loop(0, chain, body, q)[0, 0]
    return f

def total(f, iters=4):
    def call():
        _t[0] += 1e-7
        return float(np.asarray(f(q0, jnp.float32(_t[0]))))
    call()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); call(); ts.append(time.perf_counter() - t0)
    return min(ts)

for k in (10, 100):
    lo, hi = make_chain(k, C1), make_chain(k, C2)
    t1, t2 = total(lo), total(hi)
    us = (t2 - t1) / (C2 - C1) * 1e6
    gf = 2.0 * M * N * D / us / 1e3
    print(f"k={k:4d}: {us/1e3:8.2f} ms/call  {gf:8.0f} GF/s  ({M*N/us*1e6/1e9:.2f} G rows/s)", flush=True)
