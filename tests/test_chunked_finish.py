"""_chunked_top_k: the exact chunked reduction tree behind the
segmented-gstack finish (kernels/fused_topk.py).

Unit-level oracle tests, no Pallas involved: the helper must return
exactly lax.top_k's VALUES for any (width, k) — including widths that
straddle the flat-reduce guard, non-multiple-of-chunk widths (padding
slots), k <= 16 (flat path), and panels containing -inf runs (dead
entries) — with positions that index the original columns.
"""
import importlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

FT = importlib.import_module("polars_matmul_tpu.kernels.fused_topk")


def _check(panel, k):
    fv, sp = jax.jit(FT._chunked_top_k, static_argnums=1)(
        jnp.asarray(panel), k)
    fv, sp = np.asarray(fv), np.asarray(sp)
    ov = -np.sort(-panel, axis=1)[:, :k]
    np.testing.assert_array_equal(fv, ov)
    # positions must decode to the returned values
    got = np.take_along_axis(panel, sp, axis=1)
    np.testing.assert_array_equal(got, fv)


@pytest.mark.parametrize("w,k", [
    (1_000, 100),     # under the flat guard
    (8_192, 100),     # exactly at it
    (8_193, 100),     # first tree width
    (20_000, 100),    # multi-chunk, non-multiple width (padding)
    (50_000, 100),    # second tree level engages
    (20_000, 20),     # k just above the flat-k cutoff
    (50_000, 10),     # k <= 16: flat approx path
    (3_000, 512),     # w <= 4*chunk for big k: flat
    (30_000, 512),    # big-k tree
])
def test_matches_topk_oracle(w, k):
    rng = np.random.default_rng(w + k)
    panel = rng.standard_normal((16, w)).astype(np.float32)
    _check(panel, k)


def test_dead_runs_and_underfill():
    # long -inf runs (dead slabs) and a row with fewer than k live
    rng = np.random.default_rng(9)
    panel = rng.standard_normal((8, 20_000)).astype(np.float32)
    panel[:, 5_000:15_000] = -np.inf
    panel[0, :] = -np.inf
    panel[0, :50] = rng.standard_normal(50)
    _check(panel, 100)


def test_duplicate_values_positions_valid():
    # ties across chunk boundaries: values must still match the oracle
    # multiset; every position must point at an equal value
    rng = np.random.default_rng(4)
    panel = rng.integers(0, 50, (8, 20_000)).astype(np.float32)
    fv, sp = jax.jit(FT._chunked_top_k, static_argnums=1)(
        jnp.asarray(panel), 100)
    fv, sp = np.asarray(fv), np.asarray(sp)
    ov = -np.sort(-panel, axis=1)[:, :100]
    np.testing.assert_array_equal(fv, ov)
    got = np.take_along_axis(panel, sp, axis=1)
    np.testing.assert_array_equal(got, fv)
    # no position reused within a row
    for r in range(8):
        assert len(set(sp[r].tolist())) == 100
