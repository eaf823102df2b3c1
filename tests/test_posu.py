"""posu build (raw-bit-pattern segmented gstack for quantized cosine).

The quantized cosine tiers bias scores +1.0 in the epilogue (via an
in-kernel rewrite of the bias row) so the gstack build packs raw i32
bit patterns — no per-element _f32_to_u (kernels/fused_topk.py::_POSU_PAD
block comment has the encoding proof).  These tests pin the posu path
against dequantized-code oracles on the adversarial inputs the encoding
analysis calls out: pad tails, zero-norm rows, antipodal (score -1.0)
rows, masked rows, and cell pile-ups that walk the whole detection
ladder (fast pass -> in-panel re-finish -> exact kernel re-run).

Reference parity: same scenarios as the reference's exactness posture
for its swappable backends (/root/reference/tests/test_performance.py
drives one backend; our storage tiers are the analog).
"""
import importlib

import numpy as np
import jax.numpy as jnp
import pytest

from polars_matmul_tpu.config import SearchConfig

FT = importlib.import_module("polars_matmul_tpu.kernels.fused_topk")

N, DIM, K, M = 20_000, 32, 20, 8


def _corpus():
    rng = np.random.default_rng(3)
    c = rng.standard_normal((N, DIM)).astype(np.float32)
    q = rng.standard_normal((M, DIM)).astype(np.float32)
    c[100] = -q[0]          # antipodal: biased score ~0.0
    c[200] = q[0] * 2.0     # colinear duplicate-direction row
    c[300] = 0.0            # zero-norm row: must score 0, not NaN
    c[17000] = -q[3]        # antipodal in the second segment
    return c, q


def _oracle(codes, q, k):
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    norms = np.linalg.norm(codes, axis=1)
    norms[norms == 0] = np.inf
    s = (qn @ codes.T) / norms
    oidx = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return s, oidx, np.take_along_axis(s, oidx, axis=1)


def _run(c, q, k, precision, mask=None, selection="auto"):
    cfg = SearchConfig(precision=precision, use_autotune_cache=False,
                       selection=selection)
    tn = FT.corpus_tile_rows(DIM, cfg, k)
    cp, cbp = FT.prepare_corpus(jnp.asarray(c), "cosine", tn=tn,
                                precision=precision)
    kw = {"mask": jnp.asarray(mask)} if mask is not None else {}
    vals, idx = FT.fused_topk_prepared(jnp.asarray(q), cp, cbp, k,
                                       "cosine", tn=tn, config=cfg,
                                       interpret=True, **kw)
    return np.asarray(vals), np.asarray(idx), np.asarray(cp)


def test_posu_engages():
    # the guard itself: quantized cosine + segmented dense -> posu on
    cfg = SearchConfig(precision="int8c", use_autotune_cache=False)
    tn = FT.corpus_tile_rows(DIM, cfg, K)
    np_pad = ((N + tn - 1) // tn) * tn
    assert FT._gstack_geometry(np_pad // 128, K)[4] > 1


def test_posu_int8_matches_code_oracle():
    c, q = _corpus()
    vals, idx, cp = _run(c, q, K, "int8c")
    codes = cp[:N, :DIM].astype(np.float32)
    _, oidx, ovals = _oracle(codes, q, K)
    assert np.abs(vals - ovals).max() < 5e-5
    assert idx.max() < N
    mism = idx != oidx
    # index diffs only on documented near-ties
    assert np.all(np.abs(vals[mism] - ovals[mism]) < 5e-5)


def test_posu_int4_matches_code_oracle():
    c, q = _corpus()
    vals, idx, cp = _run(c, q, K, "int4c")
    lo, hi = FT._unpack_int4_i32(jnp.asarray(cp).astype(jnp.int32))
    codes = np.concatenate([np.asarray(lo), np.asarray(hi)],
                           axis=1).astype(np.float32)[:N, :DIM]
    _, oidx, ovals = _oracle(codes, q, K)
    assert np.abs(vals - ovals).max() < 5e-5
    assert idx.max() < N


def test_posu_masked_rows_never_returned():
    c, q = _corpus()
    mask = np.ones((N,), bool)
    mask[::7] = False
    vals, idx, cp = _run(c, q, K, "int8c", mask=mask)
    codes = cp[:N, :DIM].astype(np.float32)
    s, _, _ = _oracle(codes, q, K)
    s[:, ::7] = -np.inf
    oidx = np.argsort(-s, axis=1, kind="stable")[:, :K]
    ovals = np.take_along_axis(s, oidx, axis=1)
    assert np.abs(vals - ovals).max() < 5e-5
    assert not np.any(idx % 7 == 0)


@pytest.mark.parametrize("pileup", [5, 9])
def test_posu_cell_pileup_detection_ladder(pileup):
    """>= lp of a row's top-k in ONE (segment, lane-class) cell: 5
    copies overflow the fast pass (lp=3 here) into the in-panel
    re-finish; 9 overflow the stacks themselves (n_levels=6) into the
    exact kernel re-run.  Both must stay exact."""
    c, q = _corpus()
    # rows 0, 128, ..., (pileup-1)*128 share lane-class 0 of segment 0
    for i in range(pileup):
        c[i * 128] = q[0] * (1.0 + 0.001 * i)
    vals, idx, cp = _run(c, q, K, "int8c")
    codes = cp[:N, :DIM].astype(np.float32)
    _, oidx, ovals = _oracle(codes, q, K)
    assert np.abs(vals - ovals).max() < 5e-5
    # the pileup rows must all surface in q[0]'s top-k
    got = set(idx[0].tolist())
    assert all(i * 128 in got for i in range(pileup))


def test_posu_small_k_flat_finish():
    # k <= 16 takes the flat (unchunked) finish on the fast panel
    c, q = _corpus()
    vals, idx, cp = _run(c, q, 10, "int8c")
    codes = cp[:N, :DIM].astype(np.float32)
    _, oidx, ovals = _oracle(codes, q, 10)
    assert np.abs(vals - ovals).max() < 5e-5
