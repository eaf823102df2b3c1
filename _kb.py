import time
import numpy as np
import jax
import jax.numpy as jnp
from polars_matmul_tpu.kernels.fused_topk import fused_topk
from polars_matmul_tpu.config import SearchConfig

M, N, D = 1000, 10_000, 256
rng = np.random.default_rng(0)
q0 = jnp.asarray(rng.standard_normal((M, D)), dtype=jnp.float32)
c0 = jnp.asarray(rng.standard_normal((N, D)), dtype=jnp.float32)
jax.block_until_ready((q0, c0))
C1, C2 = 8, 200
_c = [0.0]

def make_chain(step, chain):
    @jax.jit
    def f(q, c, t):
        q = q + t
        def body(i, q):
            return q + step(q, c) * 1e-30
        return jax.lax.fori_loop(0, chain, body, q)[0, 0]
    return f

def total_time(f, iters=6):
    def call():
        _c[0] += 1e-7
        return float(np.asarray(f(q0, c0, jnp.float32(_c[0]))))
    call()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); call(); ts.append(time.perf_counter() - t0)
    return min(ts)

def per_step(step, label=""):
    t1 = total_time(make_chain(step, C1))
    t2 = total_time(make_chain(step, C2))
    print(f"{label:46s}: {(t2-t1)/(C2-C1)*1e6:9.1f} us/step", flush=True)

def fused_step(k, cfg):
    def step(q, c):
        vals, idx = fused_topk(q, c, k, "cosine", config=cfg)
        return jnp.max(vals, axis=1, keepdims=True)
    return step

per_step(fused_step(10, SearchConfig()), "k=10 bf16x3 pipelined bn=2048")
per_step(fused_step(10, SearchConfig(precision="highest")), "k=10 highest pipelined bn=2048")
per_step(fused_step(1, SearchConfig()), "k=1  bf16x3 pipelined bn=2048")
