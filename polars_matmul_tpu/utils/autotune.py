"""On-device kernel autotuning.

Sweeps fused-topk tile/precision candidates on the live backend and returns
the fastest ``SearchConfig``.  Timing uses dependent in-jit chains whose
lengths are differenced, so per-dispatch overhead (including this
environment's ~30-70 ms RPC tunnel, where ``block_until_ready`` does not
wait for device completion) cancels exactly; every measurement ends in a
scalar readback and carries a fresh scalar input so cached executions can
never be re-served.
"""

from __future__ import annotations

import logging
import time
from typing import Optional, Sequence, Tuple

import numpy as np

from ..config import SearchConfig, default_config, set_default_config

log = logging.getLogger("polars_matmul_tpu")

_tick = [0.0]


def _chain_seconds(step, q, chain: int, iters: int) -> float:
    """min wall time of a jitted chain of ``chain`` dependent steps."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(q, t):
        q = q + t

        def body(i, q):
            return q + step(q) * 1e-30

        return jax.lax.fori_loop(0, chain, body, q)[0, 0]

    def call():
        _tick[0] += 1e-7
        return float(np.asarray(f(q, jnp.float32(_tick[0]))))

    call()  # compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        call()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def device_step_seconds(step, q, *, chain_lo: int = 8, chain_hi: int = 72,
                        iters: int = 4) -> float:
    """Per-invocation device time of ``step(q) -> (m, 1)`` via differencing.

    Can return a non-positive value when dispatch jitter exceeds the
    chained signal — callers must treat that as "measurement invalid",
    not as a fast candidate.
    """
    t_lo = _chain_seconds(step, q, chain_lo, iters)
    t_hi = _chain_seconds(step, q, chain_hi, iters)
    return (t_hi - t_lo) / (chain_hi - chain_lo)


def autotune(
    m: int = 1000,
    n: int = 10_000,
    dim: int = 256,
    k: int = 10,
    metric: str = "cosine",
    *,
    candidates: Optional[Sequence[Tuple[int, int, str]]] = None,
    base: Optional[SearchConfig] = None,
    set_default: bool = False,
    seed: int = 0,
    verbose: bool = False,
) -> SearchConfig:
    """Measure fused-topk candidates on the live device; return the fastest.

    ``candidates`` is an iterable of (block_q, block_n, precision); the
    default grid covers the tilings that matter on v5e-class chips.  Pass
    ``set_default=True`` to install the winner as the process default.
    """
    import jax
    import jax.numpy as jnp

    from ..kernels.fused_topk import fused_topk

    cfg0 = base if base is not None else default_config()
    if jax.default_backend() != "tpu":
        # Off-TPU the Pallas kernel runs in interpret mode (~seconds per
        # call) and tile timings would rank interpreter overhead, not
        # hardware.  Nothing meaningful to tune: return the base config.
        log.warning(
            "autotune: backend %r is not TPU; returning base config "
            "unmeasured", jax.default_backend()
        )
        if set_default:
            set_default_config(cfg0)
        return cfg0
    if candidates is None:
        candidates = [
            (128, 1024, cfg0.precision),
            (256, 1024, cfg0.precision),
            (128, 2048, cfg0.precision),
            (256, 2048, cfg0.precision),
            (256, 2048, "highest"),
        ]

    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((m, dim)), dtype=jnp.float32)
    c = jnp.asarray(rng.standard_normal((n, dim)), dtype=jnp.float32)
    jax.block_until_ready((q, c))

    best, best_t = cfg0, float("inf")
    for bq, bn, prec in candidates:
        # candidates are explicit choices: disable k-based retiling so the
        # labels match what actually runs
        cfg = cfg0.with_updates(block_q=bq, block_n=bn, precision=prec,
                                auto_tile=False)

        def step(qq, cfg=cfg):
            vals, _ = fused_topk(qq, c, k, metric, config=cfg)
            return jnp.max(vals, axis=1, keepdims=True)

        try:
            t = device_step_seconds(step, q)
        except Exception as e:  # e.g. scoped-VMEM OOM for oversized tiles
            log.warning("autotune: candidate bq=%d bn=%d %s failed to "
                        "compile/run (%s); skipping", bq, bn, prec,
                        str(e)[:120])
            continue
        if verbose:
            print(f"autotune bq={bq} bn={bn} {prec}: {t*1e6:.1f} us")
        if t <= 0:
            # dispatch jitter swamped the signal; measurement invalid
            log.warning("autotune: discarding noisy measurement for "
                        "bq=%d bn=%d %s", bq, bn, prec)
            continue
        if t < best_t:
            best, best_t = cfg, t

    if set_default:
        set_default_config(best)
    return best
