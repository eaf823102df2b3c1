"""Round-3: XLA-side top-k "finish" variants for panel-based selection.

VERDICT r02 item 4: at k=100 the gstack kernel runs 0.137 ms but the XLA
finish (lax.top_k WITH indices over the (m, 1152) u panel) costs ~0.4 ms —
the finish, not the kernel, bounds the op.  Values-only top_k measured
0.02 ms, so index recovery is the entire gap.  This experiment measures
every recovery strategy on the real panel shapes:

  A. top_k with indices (current _gstack_decode)
  B. top_k values-only (lower bound; no indices — not a real variant)
  C. values-only + masked-equality min-position recovery
  D. jax.lax.approx_max_k(recall_target=1.0) — TPU PartialReduce op
  E. approx_max_k values路 consumed only (sanity on its cost split)
  F. sort_key_val full sort

Shapes: (1024, 640) k=10 (gstack k<=10 panel), (1024, 1152) k=100
(canonical k=100), (256, 141696) k=100 (the hierarchical big-corpus panel:
2M rows / 128-group segments x 9 levels x 128 lanes).
"""

import json

import numpy as np
import jax
import jax.numpy as jnp

import polars_matmul_tpu  # noqa: F401
from polars_matmul_tpu.utils.autotune import device_step_seconds

_BIG = jnp.iinfo(jnp.int32).max


def variants(P, k):
    pos = jnp.arange(P, dtype=jnp.int32)

    def a_topk_with_idx(panel):
        v, i = jax.lax.top_k(panel, k)
        return v + i.astype(jnp.float32) * 1e-30

    def b_values_only(panel):
        v, _ = jax.lax.top_k(panel, k)
        return v

    def c_equality_recovery(panel):
        v, _ = jax.lax.top_k(panel, k)
        hit = panel[:, :, None] == v[:, None, :]
        i = jnp.min(jnp.where(hit, pos[None, :, None], _BIG), axis=1)
        return v + i.astype(jnp.float32) * 1e-30

    def d_approx(panel):
        v, i = jax.lax.approx_max_k(panel, k, recall_target=1.0)
        return v + i.astype(jnp.float32) * 1e-30

    def e_approx_vals(panel):
        v, _ = jax.lax.approx_max_k(panel, k, recall_target=1.0)
        return v

    def f_sort(panel):
        v, i = jax.lax.sort_key_val(panel, jnp.broadcast_to(
            pos[None, :], panel.shape), dimension=1)
        return (v[:, -k:] + i[:, -k:].astype(jnp.float32) * 1e-30)

    return [("topk_with_idx", a_topk_with_idx),
            ("topk_vals_only", b_values_only),
            ("eq_recovery", c_equality_recovery),
            ("approx_max_k", d_approx),
            ("approx_vals_only", e_approx_vals),
            ("full_sort", f_sort)]


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(7)
    for (m, P, k) in ((1024, 640, 10), (1024, 1280, 10), (1024, 1152, 100),
                      (256, 141_696, 100)):
        panel = jnp.asarray(
            rng.standard_normal((m, P)).astype(np.float32))
        jax.block_until_ready(panel)
        # correctness cross-check for the index-bearing variants
        ref_v, ref_i = jax.lax.top_k(panel, k)
        ref_v, ref_i = np.asarray(ref_v), np.asarray(ref_i)
        for name, fn in variants(P, k):
            if P > 100_000 and name == "eq_recovery":
                continue  # (m,P,k) tensor too large
            try:
                if name in ("topk_with_idx", "approx_max_k"):
                    if name == "approx_max_k":
                        v, i = jax.lax.approx_max_k(
                            panel, k, recall_target=1.0)
                    else:
                        v, i = jax.lax.top_k(panel, k)
                    ok = bool(np.array_equal(np.asarray(i), ref_i)
                              and np.array_equal(np.asarray(v), ref_v))
                elif name == "eq_recovery":
                    v, _ = jax.lax.top_k(panel, k)
                    pos = jnp.arange(P, dtype=jnp.int32)
                    hit = panel[:, :, None] == v[:, None, :]
                    i = jnp.min(
                        jnp.where(hit, pos[None, :, None], _BIG), axis=1)
                    ok = bool(np.array_equal(np.asarray(i), ref_i))
                else:
                    ok = True

                def step(x, fn=fn):
                    return jnp.max(fn(x), axis=1, keepdims=True)

                t = device_step_seconds(panel=None, step=step) \
                    if False else device_step_seconds(
                        step, panel, chain_lo=8, chain_hi=104, iters=4)
                print(json.dumps({
                    "shape": [m, P], "k": k, "variant": name,
                    "ms": round(t * 1e3, 4), "exact": ok}), flush=True)
            except Exception as e:
                print(json.dumps({
                    "shape": [m, P], "k": k, "variant": name,
                    "error": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
