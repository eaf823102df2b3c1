"""Pallas kernels vs the pure-JAX oracle (interpret mode on CPU).

SURVEY.md §4 tier (c): kernels tested in interpret mode against the
``jax.lax.top_k`` reference path.
"""

import numpy as np
import pytest

from polars_matmul_tpu.config import SearchConfig
from polars_matmul_tpu.kernels import fused_topk, pallas_matmul
from polars_matmul_tpu.ops import topk_search

from conftest import assert_topk_equivalent


@pytest.mark.parametrize("metric", ["cosine", "dot", "euclidean"])
def test_fused_topk_matches_oracle(qc_f32, metric):
    q, c = qc_f32
    v0, i0 = topk_search(q, c, 10, metric)
    v1, i1 = fused_topk(q, c, 10, metric, interpret=True)
    assert_topk_equivalent(
        np.asarray(i1), np.asarray(v1), np.asarray(i0), np.asarray(v0)
    )


def test_fused_topk_k1(qc_f32):
    q, c = qc_f32
    v0, i0 = topk_search(q, c, 1, "cosine")
    v1, i1 = fused_topk(q, c, 1, "cosine", interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=1e-5)


def test_fused_topk_k_equals_n():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((9, 24)).astype(np.float32)
    c = rng.standard_normal((17, 24)).astype(np.float32)
    v0, i0 = topk_search(q, c, 17, "cosine")
    v1, i1 = fused_topk(q, c, 17, "cosine", interpret=True)
    assert_topk_equivalent(
        np.asarray(i1), np.asarray(v1), np.asarray(i0), np.asarray(v0)
    )


def test_fused_topk_multi_tile():
    """Corpus spanning several kernel tiles exercises the carry merge."""
    rng = np.random.default_rng(1)
    q = rng.standard_normal((13, 32)).astype(np.float32)
    c = rng.standard_normal((700, 32)).astype(np.float32)
    cfg = SearchConfig(block_q=8, block_n=128)
    v0, i0 = topk_search(q, c, 7, "cosine")
    v1, i1 = fused_topk(q, c, 7, "cosine", config=cfg, interpret=True)
    assert_topk_equivalent(
        np.asarray(i1), np.asarray(v1), np.asarray(i0), np.asarray(v0)
    )


def test_fused_topk_insert_multi_tile():
    """selection="insert" across several corpus tiles: the candidate-count
    bounded merge-insertion must agree exactly with the oracle."""
    rng = np.random.default_rng(11)
    q = rng.standard_normal((13, 32)).astype(np.float32)
    c = rng.standard_normal((700, 32)).astype(np.float32)
    cfg = SearchConfig(selection="insert", block_q=8, block_n=128)
    for k in (1, 7, 24):
        v0, i0 = topk_search(q, c, k, "cosine")
        v1, i1 = fused_topk(q, c, k, "cosine", config=cfg, interpret=True)
        assert_topk_equivalent(
            np.asarray(i1), np.asarray(v1), np.asarray(i0), np.asarray(v0)
        )


def test_fused_topk_insert_tie_break():
    """Duplicate corpus rows under selection="insert": lowest index wins,
    both within a tile and across the carry (earlier tiles win ties)."""
    rng = np.random.default_rng(12)
    base = rng.standard_normal((4, 16)).astype(np.float32)
    c = np.concatenate([base] * 5)  # duplicates 16 apart span tiles
    q = base[:1]
    cfg = SearchConfig(selection="insert", block_q=8, block_n=8)
    _, idx = fused_topk(q, c, 5, "dot", config=cfg, interpret=True)
    idx = np.asarray(idx)[0]
    assert idx[0] < 4
    np.testing.assert_array_equal(idx, idx[0] + 4 * np.arange(5))


def test_fused_topk_stack_multi_tile_large_k():
    """selection="stack" at k near/above the 4x-unrolled fori threshold
    across several corpus tiles, vs the oracle.  Score tolerance covers
    the strategy's low-mantissa group packing (<= 2^low_bits - 1 ulps)."""
    rng = np.random.default_rng(21)
    q = rng.standard_normal((9, 48)).astype(np.float32)
    c = rng.standard_normal((3000, 48)).astype(np.float32)
    cfg = SearchConfig(selection="stack", block_q=8, block_n=1024)
    for k in (3, 17, 100):
        v0, i0 = topk_search(q, c, k, "cosine")
        v1, i1 = fused_topk(q, c, k, "cosine", config=cfg, interpret=True)
        assert_topk_equivalent(
            np.asarray(i1), np.asarray(v1), np.asarray(i0), np.asarray(v0)
        )


def test_fused_topk_stack_exactness_fallback():
    """Adversarial input for selection="stack": more than _STACK_DEPTH of
    one row's top-k land in ONE lane class of ONE tile, so the per-class
    stacks alone would drop some of them.  The st[D] detection must route
    the tile through the exact full-width extraction."""
    from polars_matmul_tpu.kernels.fused_topk import _STACK_DEPTH

    rng = np.random.default_rng(22)
    n, d = 2048, 16
    c = rng.standard_normal((n, d)).astype(np.float32) * 1e-3
    q = np.ones((1, d), dtype=np.float32)
    # Plant the 14 best scores (> _STACK_DEPTH + 1) in lane class 5 of the
    # single 2048-wide tile: positions 5, 133, 261, ... (5 + 128*g).
    hot = 5 + 128 * np.arange(14)
    c[hot] = (q[0] / np.linalg.norm(q[0])) * (2.0 + np.arange(14))[:, None]
    cfg = SearchConfig(selection="stack", block_q=8, block_n=2048)
    k = 16
    v0, i0 = topk_search(q, c, k, "dot")
    v1, i1 = fused_topk(q, c, k, "dot", config=cfg, interpret=True)
    # the 14 planted rows must all be found, exactly
    np.testing.assert_array_equal(np.asarray(i1)[0, :14], hot[::-1])
    assert_topk_equivalent(
        np.asarray(i1), np.asarray(v1), np.asarray(i0), np.asarray(v0)
    )


def test_fused_topk_stack_tie_break():
    """Duplicate corpus rows under selection="stack": lowest index wins
    within a tile (reversed group bits + min-lane pop), across groups,
    and across the carry (earlier tiles win clean-value ties)."""
    rng = np.random.default_rng(23)
    base = rng.standard_normal((4, 16)).astype(np.float32)
    c = np.concatenate([base] * 80)  # 4 tiles of 128 rows at block_n=128
    q = base[:1]
    cfg = SearchConfig(selection="stack", block_q=8, block_n=128)
    _, idx = fused_topk(q, c, 17, "dot", config=cfg, interpret=True)
    idx = np.asarray(idx)[0]
    assert idx[0] < 4
    np.testing.assert_array_equal(idx, idx[0] + 4 * np.arange(17))


def test_fused_topk_gstack_multi_tile():
    """selection="gstack" (stacks persisted across corpus tiles, one pop
    per query block) vs the oracle across tile counts and k regimes.
    Score tolerance covers the global group packing (<= 127 ulps)."""
    rng = np.random.default_rng(31)
    for (m, n, d, k, bn) in [(9, 3000, 48, 100, 1024), (5, 700, 32, 7, 128),
                             (16, 16384, 8, 37, 2048)]:
        q = rng.standard_normal((m, d)).astype(np.float32)
        c = rng.standard_normal((n, d)).astype(np.float32)
        c[n // 2] = c[0]
        cfg = SearchConfig(selection="gstack", block_q=16, block_n=bn,
                           precision="highest")
        v0, i0 = topk_search(q, c, k, "cosine")
        v1, i1 = fused_topk(q, c, k, "cosine", config=cfg, interpret=True)
        assert_topk_equivalent(
            np.asarray(i1), np.asarray(v1), np.asarray(i0), np.asarray(v0),
            rtol=3e-5, atol=2e-5,
        )


def test_fused_topk_gstack_exactness_fallback():
    """Adversarial gstack input: more than _STACK_DEPTH of one row's
    top-k land in ONE lane class (across ALL tiles — the stacks are
    global), so the frozen detection level must fire and route the whole
    batch through the exact extract re-run (lax.cond)."""
    from polars_matmul_tpu.kernels.fused_topk import _STACK_DEPTH

    rng = np.random.default_rng(32)
    n, d = 2048, 16
    c = rng.standard_normal((n, d)).astype(np.float32) * 1e-3
    q = np.ones((1, d), dtype=np.float32)
    # 14 > _STACK_DEPTH + 1 planted winners, all in lane class 5, spread
    # over several 128-row groups AND two 1024-row tiles.
    hot = 5 + 128 * np.arange(14)
    c[hot] = (q[0] / np.linalg.norm(q[0])) * (2.0 + np.arange(14))[:, None]
    cfg = SearchConfig(selection="gstack", block_q=8, block_n=1024)
    k = 16
    v0, i0 = topk_search(q, c, k, "dot")
    v1, i1 = fused_topk(q, c, k, "dot", config=cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(i1)[0, :14], hot[::-1])
    assert_topk_equivalent(
        np.asarray(i1), np.asarray(v1), np.asarray(i0), np.asarray(v0)
    )


def test_fused_topk_gstack_tie_break():
    """Duplicate corpus rows under selection="gstack": lowest index wins
    across groups AND tiles (the reversed GLOBAL group bits make earlier
    tiles win ties with no carry involved)."""
    rng = np.random.default_rng(33)
    base = rng.standard_normal((4, 16)).astype(np.float32)
    c = np.concatenate([base] * 80)  # 320 rows -> 3 tiles at block_n=128
    q = base[:1]
    cfg = SearchConfig(selection="gstack", block_q=8, block_n=128)
    _, idx = fused_topk(q, c, 17, "dot", config=cfg, interpret=True)
    idx = np.asarray(idx)[0]
    assert idx[0] < 4
    np.testing.assert_array_equal(idx, idx[0] + 4 * np.arange(17))


def test_fused_topk_gstack_segmented():
    """Corpora beyond 128 global groups (16,384 padded rows) run the
    SEGMENTED gstack: per-128-group stacks flushed to one HBM panel slab
    per segment, one XLA finish over all slabs.  Values exact within the
    packing truncation; indices tie-equivalent (cross-segment
    duplicate-score order is the documented exception)."""
    rng = np.random.default_rng(34)
    for (m, n, d, k, bn) in [(9, 40_000, 32, 100, 2048),
                             (5, 20_000, 16, 20, 128),
                             (16, 33_000, 8, 37, 1024)]:
        q = rng.standard_normal((m, d)).astype(np.float32)
        c = rng.standard_normal((n, d)).astype(np.float32)
        c[n // 2] = c[0]  # a duplicate crossing segments
        cfg = SearchConfig(selection="gstack", block_q=16, block_n=bn,
                           precision="highest")
        v0, i0 = topk_search(q, c, k, "cosine")
        v1, i1 = fused_topk(q, c, k, "cosine", config=cfg, interpret=True)
        assert_topk_equivalent(
            np.asarray(i1), np.asarray(v1), np.asarray(i0), np.asarray(v0),
            rtol=3e-5, atol=2e-5,
        )


def test_fused_topk_gstack_segmented_fallback():
    """Planted winners concentrated in one (segment, lane-class) cell —
    deeper than the segmented stacks — must fire the per-segment
    detection slab and route through the exact extract re-run."""
    rng = np.random.default_rng(41)
    n, d, k = 50_000, 16, 20
    c = rng.standard_normal((n, d)).astype(np.float32) * 1e-3
    q = np.ones((1, d), dtype=np.float32)
    hot = 5 + 128 * np.arange(8)  # 8 > the ~5 segmented levels at k=20
    c[hot] = (q[0] / np.linalg.norm(q[0])) * (2.0 + np.arange(8))[:, None]
    cfg = SearchConfig(selection="gstack", block_q=8, block_n=1024)
    v0, i0 = topk_search(q, c, k, "dot")
    v1, i1 = fused_topk(q, c, k, "dot", config=cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(i1)[0, :8], hot[::-1])
    assert_topk_equivalent(
        np.asarray(i1), np.asarray(v1), np.asarray(i0), np.asarray(v0)
    )


def test_fused_topk_gstack_envelope_errors():
    """Explicit gstack outside its envelope (k > 128, or a segmented
    corpus whose tile's group count does not divide 128) must raise, not
    silently degrade."""
    rng = np.random.default_rng(34)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    c = rng.standard_normal((20_000, 16)).astype(np.float32)
    cfg = SearchConfig(selection="gstack", block_q=8, block_n=384)
    with pytest.raises(ValueError, match="gstack"):
        # 384 rows/tile = 3 groups; 128 % 3 != 0 -> segments misalign
        fused_topk(q, c, 20, "dot", config=cfg, interpret=True)
    # k beyond the fused ceiling: dispatch falls back to XLA before any
    # selection runs (no raise), and an explicit gstack that does reach
    # resolution refuses (128 < k <= 1024 is now inside the envelope).
    from polars_matmul_tpu.kernels.fused_topk import _resolve_selection
    with pytest.raises(ValueError, match="gstack"):
        _resolve_selection("gstack", 1100, 200, False, 7)


def test_fused_topk_gstack_masked_prune():
    """gstack + prune (its tile gate is the weakest-class-best bound) +
    mask: exact vs the oracle on a corpus spanning >= 16 tiles so
    prune="on" actually gates."""
    rng = np.random.default_rng(35)
    m, n, d, k = 6, 4000, 24, 20
    q = rng.standard_normal((m, d)).astype(np.float32)
    c = rng.standard_normal((n, d)).astype(np.float32)
    mask = rng.random(n) < 0.6
    mask[rng.choice(n, size=k, replace=False)] = True
    cfg = SearchConfig(selection="gstack", block_q=8, block_n=128,
                       prune="on", precision="highest")
    import jax.numpy as jnp
    v0, i0 = topk_search(q, c, k, "cosine", mask=jnp.asarray(mask))
    v1, i1 = fused_topk(q, c, k, "cosine", mask=mask, config=cfg,
                        interpret=True)
    assert_topk_equivalent(
        np.asarray(i1), np.asarray(v1), np.asarray(i0), np.asarray(v0),
        rtol=3e-5, atol=2e-5,
    )


def test_fused_topk_gpop_multi_tile():
    """selection="gpop" (gstack build + in-kernel k-pop finish, k <= 16)
    vs the oracle across tile counts.  Score tolerance covers the global
    group packing (<= 127 ulps), exactly like gstack."""
    rng = np.random.default_rng(36)
    for (m, n, d, k, bn) in [(9, 3000, 48, 16, 1024), (5, 700, 32, 7, 128),
                             (16, 16384, 8, 10, 2048), (3, 90, 8, 2, 128)]:
        q = rng.standard_normal((m, d)).astype(np.float32)
        c = rng.standard_normal((n, d)).astype(np.float32)
        c[n // 2] = c[0]
        cfg = SearchConfig(selection="gpop", block_q=16, block_n=bn,
                           precision="highest")
        v0, i0 = topk_search(q, c, k, "cosine")
        v1, i1 = fused_topk(q, c, k, "cosine", config=cfg, interpret=True)
        assert_topk_equivalent(
            np.asarray(i1), np.asarray(v1), np.asarray(i0), np.asarray(v0),
            rtol=3e-5, atol=2e-5,
        )


def test_fused_topk_gpop_exactness_fallback():
    """Adversarial gpop input: more of one row's top-k land in ONE lane
    class than the stacks are deep, so the in-kernel detection (deepest
    level vs the popped k-th best, signalled through the kp-1 sentinel
    slot) must fire and route the batch through the exact extract
    re-run."""
    rng = np.random.default_rng(37)
    n, d = 2048, 16
    c = rng.standard_normal((n, d)).astype(np.float32) * 1e-3
    q = np.ones((1, d), dtype=np.float32)
    # 14 planted winners, all in lane class 5 (> 6 stack levels at k=16),
    # spread over several 128-row groups AND two 1024-row tiles.
    hot = 5 + 128 * np.arange(14)
    c[hot] = (q[0] / np.linalg.norm(q[0])) * (2.0 + np.arange(14))[:, None]
    cfg = SearchConfig(selection="gpop", block_q=8, block_n=1024)
    k = 16
    v0, i0 = topk_search(q, c, k, "dot")
    v1, i1 = fused_topk(q, c, k, "dot", config=cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(i1)[0, :14], hot[::-1])
    assert_topk_equivalent(
        np.asarray(i1), np.asarray(v1), np.asarray(i0), np.asarray(v0)
    )


def test_fused_topk_gpop_tie_break():
    """Duplicate corpus rows under selection="gpop": lowest index wins
    across groups AND tiles (reversed global group bits + lowest-lane
    pop), mirroring gstack's contract."""
    rng = np.random.default_rng(38)
    base = rng.standard_normal((4, 16)).astype(np.float32)
    c = np.concatenate([base] * 80)  # 320 rows -> 3 tiles at block_n=128
    q = base[:1]
    cfg = SearchConfig(selection="gpop", block_q=8, block_n=128)
    _, idx = fused_topk(q, c, 13, "dot", config=cfg, interpret=True)
    idx = np.asarray(idx)[0]
    assert idx[0] < 4
    np.testing.assert_array_equal(idx, idx[0] + 4 * np.arange(13))


def test_fused_topk_gpop_envelope_errors():
    """Explicit gpop outside its envelope (k > 16, corpus > 128 global
    groups, or k >= k_pad) must raise, not silently degrade."""
    rng = np.random.default_rng(39)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    c_small = rng.standard_normal((500, 16)).astype(np.float32)
    c_big = rng.standard_normal((20_000, 16)).astype(np.float32)
    cfg = SearchConfig(selection="gpop", block_q=8, block_n=128)
    with pytest.raises(ValueError, match="gpop"):
        fused_topk(q, c_small, 20, "dot", config=cfg, interpret=True)
    with pytest.raises(ValueError, match="gpop"):
        fused_topk(q, c_big, 10, "dot", config=cfg, interpret=True)
    cfg16 = SearchConfig(selection="gpop", block_q=8, block_n=128,
                         k_pad=16)
    with pytest.raises(ValueError, match="gpop"):
        fused_topk(q, c_small, 16, "dot", config=cfg16, interpret=True)


def test_fused_topk_gpop_masked_prune():
    """gpop + prune (the gstack weakest-class-best tile gate) + mask:
    exact vs the oracle on a corpus spanning >= 16 tiles so prune="on"
    actually gates."""
    rng = np.random.default_rng(40)
    m, n, d, k = 6, 4000, 24, 12
    q = rng.standard_normal((m, d)).astype(np.float32)
    c = rng.standard_normal((n, d)).astype(np.float32)
    mask = rng.random(n) < 0.6
    mask[rng.choice(n, size=k, replace=False)] = True
    cfg = SearchConfig(selection="gpop", block_q=8, block_n=128,
                       prune="on", precision="highest")
    import jax.numpy as jnp
    v0, i0 = topk_search(q, c, k, "cosine", mask=jnp.asarray(mask))
    v1, i1 = fused_topk(q, c, k, "cosine", mask=mask, config=cfg,
                        interpret=True)
    assert_topk_equivalent(
        np.asarray(i1), np.asarray(v1), np.asarray(i0), np.asarray(v0),
        rtol=3e-5, atol=2e-5,
    )


def test_fused_topk_zero_norm_rows():
    q = np.zeros((3, 8), dtype=np.float32)
    q[1, 0] = 1.0
    c = np.zeros((5, 8), dtype=np.float32)
    c[2, 0] = 1.0
    v, i = fused_topk(q, c, 2, "cosine", interpret=True)
    v = np.asarray(v)
    # zero-norm query rows: every score must be exactly 0.0
    assert (v[0] == 0.0).all() and (v[2] == 0.0).all()
    # real row: best match is corpus 2 with score 1
    assert np.asarray(i)[1, 0] == 2
    np.testing.assert_allclose(v[1, 0], 1.0, rtol=1e-6)


def test_fused_topk_duplicate_corpus_rows_tie_break():
    """Identical corpus rows produce exact score ties -> lowest index wins."""
    rng = np.random.default_rng(2)
    base = rng.standard_normal((4, 16)).astype(np.float32)
    c = np.concatenate([base, base, base])  # indices i, i+4, i+8 identical
    q = base[:1]
    _, idx = fused_topk(q, c, 3, "dot", interpret=True)
    idx = np.asarray(idx)[0]
    # top-1 is some index j < 4; the duplicates must follow in index order
    assert idx[0] < 4
    assert idx[1] == idx[0] + 4
    assert idx[2] == idx[0] + 8


def test_fused_topk_large_k_stays_fused(qc_f32):
    """128 < k <= 1024 runs FUSED with the auto-raised carry width
    (round 4; it used to divert to the XLA fallback) and must match the
    oracle up to the documented gstack near-tie exception (the packed
    group bits truncate scores by a few ulps, so equal-within-truncation
    neighbors may swap index order — pair-consistent, not bit-identical).
    Beyond _MAX_FUSED_K the dispatcher still falls back."""
    q, c = qc_f32
    k = min(200, c.shape[0])
    v1, i1 = fused_topk(q, c, k, "cosine")
    v0, i0 = topk_search(q, c, k, "cosine")
    assert_topk_equivalent(np.asarray(i1), np.asarray(v1),
                           np.asarray(i0), np.asarray(v0))


def test_fused_topk_f64_falls_back(qc_f64):
    q, c = qc_f64
    v1, i1 = fused_topk(q, c, 5, "cosine")  # dispatcher -> XLA path
    v0, i0 = topk_search(q, c, 5, "cosine")
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=1e-12)


def test_pallas_matmul(qc_f32):
    q, c = qc_f32
    out = np.asarray(pallas_matmul(q, c, interpret=True))
    np.testing.assert_allclose(out, q @ c.T, rtol=1e-5, atol=1e-5)


def test_pallas_matmul_k_accumulation():
    """dim spanning several K tiles exercises the accumulator reset/flush."""
    rng = np.random.default_rng(3)
    q = rng.standard_normal((16, 300)).astype(np.float32)
    c = rng.standard_normal((40, 300)).astype(np.float32)
    out = np.asarray(
        pallas_matmul(q, c, block_k=128, interpret=True)
    )
    np.testing.assert_allclose(out, q @ c.T, rtol=1e-4, atol=1e-4)


def test_fused_topk_extreme_negative_scores():
    """Padding-tail masking must be exact (-inf bias), not a finite floor:
    legitimate scores can fall below any finite constant."""
    q = np.array([[2e18]], dtype=np.float32)
    c = np.array([[-2e18], [-1e18], [1e10]], dtype=np.float32)  # n % tn != 0
    v, i = fused_topk(q, c, 3, "dot", interpret=True)
    i = np.asarray(i)[0]
    assert set(i.tolist()) == {0, 1, 2}, i  # no padded index leaks
    assert i[0] == 2 and i[1] == 1 and i[2] == 0


def test_fused_topk_fuzz_shapes_and_tilings():
    """Randomized sweep over shapes, k, metrics, tile configs and both
    selection strategies vs the oracle (interpret mode).  Catches padding /
    tiling / carry edge cases that handpicked shapes miss."""
    rng = np.random.default_rng(99)
    metrics = ["cosine", "dot", "euclidean"]
    for trial in range(18):
        m = int(rng.integers(1, 40))
        n = int(rng.integers(1, 600))
        d = int(rng.integers(1, 200))
        # every 6th trial exercises the large-k (4x-unrolled fori) path
        k_hi = min(n, 60) if trial % 6 == 5 else min(n, 24)
        k = int(rng.integers(1, k_hi + 1))
        metric = metrics[trial % 3]
        sel = ("extract", "bucket", "insert", "stack")[trial % 4]
        bq = int(rng.choice([8, 16, 64, 256]))
        bn = int(rng.choice([128, 256, 1024]))
        prec = ("bf16x3", "highest")[trial % 2]
        q = rng.standard_normal((m, d)).astype(np.float32)
        c = rng.standard_normal((n, d)).astype(np.float32)
        # sprinkle exact duplicates and zero rows
        if n >= 4:
            c[n // 2] = c[0]
            c[-1] = 0.0
        if m >= 2:
            q[-1] = 0.0
        mask = None
        if trial % 4 == 3 and n > k:  # filtered-search trials
            mask = rng.random(n) < 0.7
            # keep >= k DISTINCT rows valid
            mask[rng.choice(n, size=k, replace=False)] = True
        cfg = SearchConfig(selection=sel, block_q=bq, block_n=bn,
                           precision=prec)
        v1, i1 = fused_topk(q, c, k, metric, mask=mask, config=cfg,
                            interpret=True)
        import jax.numpy as jnp
        mk = None if mask is None else jnp.asarray(mask)
        v0, i0 = topk_search(q, c, k, metric, mask=mk)
        # bf16x3's dropped lo.lo term accumulates over the contraction:
        # on unnormalized metrics the absolute score error grows ~sqrt(d)
        # (relative error stays ~5e-5); scale the tolerance accordingly.
        if prec == "bf16x3":
            tol = dict(rtol=2e-4, atol=8e-6 + 8e-6 * d ** 0.5)
        else:
            tol = dict(rtol=2e-5, atol=8e-6)
        try:
            assert_topk_equivalent(
                np.asarray(i1), np.asarray(v1), np.asarray(i0),
                np.asarray(v0), **tol
            )
        except AssertionError as e:
            raise AssertionError(
                f"trial {trial}: m={m} n={n} d={d} k={k} {metric} {sel} "
                f"bq={bq} bn={bn} {prec}: {e}"
            ) from e


@pytest.mark.parametrize("sel", ["extract", "bucket", "insert", "stack",
                                 "gstack", "gpop"])
@pytest.mark.parametrize("metric", ["cosine", "euclidean"])
def test_underfilled_slots_carry_index_sentinels(sel, metric):
    """Fewer matching rows than k, spread over several corpus tiles:
    every unfilled slot must be (-inf/+inf score, int32-max index).
    Regression (reviewer-confirmed): 'extract' re-emitted a consumed
    carry slot's stale index, 'bucket' leaked MASKED rows' real indices
    through the lexicographic tie-break on all--inf values."""
    rng = np.random.default_rng(17)
    m, n, d, k = 5, 600, 32, 7
    q = rng.standard_normal((m, d)).astype(np.float32)
    c = rng.standard_normal((n, d)).astype(np.float32)
    mask = np.zeros(n, bool)
    matches = [10, 20, 350]          # 3 matches < k, two tiles at bn=256
    mask[matches] = True
    cfg = SearchConfig(selection=sel, block_q=8, block_n=256)
    v, i = fused_topk(q, c, k, metric, mask=mask, config=cfg,
                      interpret=True)
    v, i = np.asarray(v), np.asarray(i)
    big = np.iinfo(np.int32).max
    assert set(np.unique(i[:, :3])) <= set(matches), i[:, :3]
    np.testing.assert_array_equal(i[:, 3:], np.full((m, k - 3), big))
    bad = np.inf if metric == "euclidean" else -np.inf
    assert np.all(v[:, 3:] == bad)
    assert np.all(np.isfinite(v[:, :3]))


class TestHighDimKChunking:
    """dim > max_fused_dim runs the kernel K-chunked: a third (minor)
    grid axis over 2048-wide feature chunks, partial dots accumulated in
    a VMEM scratch tile, epilogue + selection on the final chunk.  The
    dispatcher only picks it over XLA when the (m, n) score matrix would
    be large (measured: XLA wins on raw speed at high dim), so these
    tests force it via max_fused_dim/fallback_score_bytes."""

    # Chunking itself triggers on dim > 8192 (feature_geometry is config-
    # independent so prep and run always agree); the config here only
    # forces the DISPATCHER to pick the kernel over XLA at high dim.
    CFG = SearchConfig(fallback_score_bytes=0)

    @pytest.mark.parametrize("metric", ["cosine", "dot", "euclidean"])
    def test_matches_oracle_chunked(self, metric):
        rng = np.random.default_rng(61)
        dim = 8600  # pads to 8704 -> ck=2048, nk=5 (genuinely chunked)
        q = (rng.standard_normal((9, dim)) / 90).astype(np.float32)
        c = (rng.standard_normal((60, dim)) / 90).astype(np.float32)
        v0, i0 = topk_search(q, c, 7, metric)
        for prec in ("bf16x3", "highest"):
            cfg = self.CFG.with_updates(precision=prec)
            v, i = fused_topk(q, c, 7, metric, config=cfg)
            assert_topk_equivalent(np.asarray(i), np.asarray(v),
                                   np.asarray(i0), np.asarray(v0))

    def test_chunked_insert_selection(self):
        """selection="insert" runs on the final K-chunk like the other
        strategies; the candidate-count loop must see the fully
        accumulated scores."""
        rng = np.random.default_rng(64)
        dim = 8600
        q = (rng.standard_normal((7, dim)) / 90).astype(np.float32)
        c = (rng.standard_normal((60, dim)) / 90).astype(np.float32)
        cfg = self.CFG.with_updates(selection="insert")
        v, i = fused_topk(q, c, 6, "cosine", config=cfg)
        v0, i0 = topk_search(q, c, 6, "cosine")
        assert_topk_equivalent(np.asarray(i), np.asarray(v),
                               np.asarray(i0), np.asarray(v0))

    def test_geometry(self):
        from polars_matmul_tpu.kernels.fused_topk import feature_geometry

        assert feature_geometry(256) == (256, 256, 1)
        # single-chunk caps at 4096: a 256-row 8192-wide Q tile alone is
        # 8.4 MB, which no corpus-tile shrink can fit into VMEM
        assert feature_geometry(4096) == (4096, 4096, 1)
        assert feature_geometry(8192) == (2048, 8192, 4)
        assert feature_geometry(8193) == (2048, 10240, 5)
        assert feature_geometry(12288) == (2048, 12288, 6)

    def test_supports_policy(self):
        from polars_matmul_tpu.kernels.fused_topk import supports

        cfg = SearchConfig()
        # high dim + small scores -> XLA fallback (measured faster)
        assert not supports((100, 9000), (1000, 9000), np.float32, 10, cfg)
        # high dim + huge score matrix -> fused kernel (never materializes)
        assert supports((2000, 9000), (200_000, 9000), np.float32, 10, cfg)
        # normal dim -> fused kernel
        assert supports((100, 256), (1000, 256), np.float32, 10, cfg)

    def test_chunked_with_mask(self):
        rng = np.random.default_rng(62)
        dim = 8600
        q = (rng.standard_normal((5, dim)) / 90).astype(np.float32)
        c = (rng.standard_normal((50, dim)) / 90).astype(np.float32)
        mask = rng.random(50) < 0.5
        v, i = fused_topk(q, c, 4, "cosine", mask=mask, config=self.CFG)
        v0, i0 = topk_search(q, c, 4, "cosine", mask=mask)
        assert_topk_equivalent(np.asarray(i), np.asarray(v),
                               np.asarray(i0), np.asarray(v0))

    def test_chunked_prepared_corpus_path(self):
        import polars_matmul_tpu as pmt

        rng = np.random.default_rng(63)
        dim = 8600
        q = (rng.standard_normal((5, dim)) / 90).astype(np.float32)
        c = (rng.standard_normal((60, dim)) / 90).astype(np.float32)
        from polars_matmul_tpu.api.search import _quantize_rows_np

        oracles = {"f32": c, "bf16": None, "int8": None}
        import ml_dtypes

        oracles["bf16"] = c.astype(ml_dtypes.bfloat16).astype(np.float32)
        codes, scales = _quantize_rows_np(c)
        oracles["int8"] = codes.astype(np.float32) * scales[:, None]
        for storage, c_oracle in oracles.items():
            h = pmt.Corpus(c, storage=storage, config=self.CFG)
            i, v = h.topk(q, 5)
            assert len(h._prepared) == 1      # pallas path taken
            # contract: agree with the STORAGE-quantized corpus (random
            # high-dim scores are nearly tied, so exact-f32 agreement is
            # not the right oracle for quantized storage)
            i0, _ = pmt.topk(q, c_oracle, 5)
            assert (i == i0).mean() > 0.9, storage


class TestTilePruning:
    """Exact tile pruning: a tile is skipped when no row's tile-max BEATS
    that row's current k-th best (ties lose to the carry, so strict >)."""

    def _check(self, q, c, k, metric, cfg, mask=None):
        v, i = fused_topk(q, c, k, metric, mask=mask, config=cfg)
        v0, i0 = topk_search(q, c, k, metric, mask=mask,
                             precision="highest")
        v, i, v0, i0 = map(np.asarray, (v, i, v0, i0))
        # Index diffs are allowed only where the oracle scores sit inside
        # the kernel's precision envelope (bf16x3 matmul ~4e-6 rel +
        # stack/gstack low-bit truncation): two near-equal scores may
        # swap order after truncation.  Everywhere else: exact.
        mism = i != i0
        assert np.all(
            np.abs(v[mism] - v0[mism]) <= 1e-5 + 2e-5 * np.abs(v0[mism])
        ), f"non-tie index mismatch at {np.argwhere(mism)}"

    @pytest.mark.parametrize("metric", ["cosine", "dot", "euclidean"])
    def test_exact_many_tiles(self, metric):
        rng = np.random.default_rng(71)
        q = rng.standard_normal((8, 32)).astype(np.float32)
        c = rng.standard_normal((40000, 32)).astype(np.float32)  # ~20 tiles
        self._check(q, c, 7, metric, SearchConfig(prune="on"))
        self._check(q, c, 7, metric, SearchConfig(prune="auto"))

    def test_ties_never_skipped_wrong(self):
        # exact duplicate rows across tiles: the carry's lowest-index copy
        # must win and pruning must not corrupt that
        rng = np.random.default_rng(72)
        base = rng.standard_normal((3000, 16)).astype(np.float32)
        c = np.vstack([base] * 3)  # every row appears 3x, tiles apart
        q = rng.standard_normal((5, 16)).astype(np.float32)
        v, i = fused_topk(q, c, 6, "cosine", config=SearchConfig(prune="on"))
        v0, i0 = topk_search(q, c, 6, "cosine")
        i = np.asarray(i)
        np.testing.assert_array_equal(i, np.asarray(i0))
        # top-6 = the top-2 base rows, each followed by its two copies in
        # index order (lowest-index-wins among exact ties)
        np.testing.assert_array_equal(i[:, 1], i[:, 0] + 3000)
        np.testing.assert_array_equal(i[:, 2], i[:, 0] + 6000)
        np.testing.assert_array_equal(i[:, 4], i[:, 3] + 3000)
        np.testing.assert_array_equal(i[:, 5], i[:, 3] + 6000)

    def test_mask_and_large_k_regime(self):
        rng = np.random.default_rng(73)
        q = rng.standard_normal((4, 16)).astype(np.float32)
        c = rng.standard_normal((40000, 16)).astype(np.float32)
        mask = rng.random(40000) < 0.2
        self._check(q, c, 5, "dot", SearchConfig(prune="on"), mask=mask)
        # k > 16 takes the fori_loop extraction path under pl.when
        self._check(q, c, 40, "cosine", SearchConfig(prune="on"))

    def test_auto_threshold(self):
        # small corpora (few tiles) leave pruning off under "auto":
        # same compiled behavior as before, just verify correctness
        rng = np.random.default_rng(74)
        q = rng.standard_normal((6, 32)).astype(np.float32)
        c = rng.standard_normal((500, 32)).astype(np.float32)
        self._check(q, c, 5, "cosine", SearchConfig())

    @pytest.mark.parametrize("m", [72, 200])
    def test_group_prune_many_query_rows(self, m):
        # m > _PRUNE_GROUP query rows with k <= 16 take the per-row-group
        # gating path (each group's extraction fires independently, incl.
        # a ragged tail group — tm is a multiple of 8, not of the group
        # size); k=40 covers the whole-tile gate on the fori_loop body,
        # which stays tile-level at k > 16
        rng = np.random.default_rng(75)
        q = rng.standard_normal((m, 32)).astype(np.float32)
        c = rng.standard_normal((40000, 32)).astype(np.float32)
        self._check(q, c, 7, "cosine", SearchConfig(prune="on"))
        self._check(q, c, 40, "dot", SearchConfig(prune="on"))

    def test_group_prune_ties_across_tiles(self):
        # duplicate rows tiles apart: per-group gating must preserve
        # lowest-index-wins for every row of every group
        rng = np.random.default_rng(76)
        base = rng.standard_normal((3000, 16)).astype(np.float32)
        c = np.vstack([base] * 3)
        q = rng.standard_normal((72, 16)).astype(np.float32)
        v, i = fused_topk(q, c, 6, "cosine", config=SearchConfig(prune="on"))
        _, i0 = topk_search(q, c, 6, "cosine")
        i = np.asarray(i)
        np.testing.assert_array_equal(i, np.asarray(i0))
        np.testing.assert_array_equal(i[:, 1], i[:, 0] + 3000)
        np.testing.assert_array_equal(i[:, 2], i[:, 0] + 6000)


def test_bf16x3_adversarial_corner_pins_documented_bound():
    """Pin the bf16x3 worst case (VERDICT r02 weak #6): every element has
    all-ones low mantissa bits, so the integer-masked hi split drops the
    largest possible lo and every dropped lo.lo product term aligns with
    the same sign.  The dot-product error must land at the documented
    ~1.5e-5 relative worst case (config.py:75-84) — no better (proving
    this IS the corner) and no worse (proving the bound holds), and
    precision="highest" must erase it."""
    d, n, m, k = 256, 256, 4, 4
    # 1.0 with the 15 f32 mantissa bits below the bf16 boundary all set:
    # lo/v = (2^15-1)/2^23 ~ 2^-8, so the dropped lo.lo term is ~2^-16
    # ~ 1.526e-5 relative, identical (and thus perfectly aligned) for
    # every one of the d products in every score.
    v = np.array(0x3F800000 | 0x7FFF, dtype=np.uint32).view(np.float32)
    q = np.full((m, d), v, np.float32)
    c = np.full((n, d), v, np.float32)
    exact = d * float(np.float64(v)) ** 2

    # selection="extract" keeps scores bit-exact through selection, so the
    # measured error is the matmul term alone (gpop/gstack would stack
    # their <=127-ulp group-bit truncation on top).
    vals, _ = fused_topk(q, c, k, "dot",
                         config=SearchConfig(selection="extract"),
                         interpret=True)
    rel = abs(float(np.asarray(vals)[0, 0]) - exact) / exact
    assert 1.3e-5 < rel < 1.7e-5, rel  # the documented ~1.5e-5 corner

    vals_hi, _ = fused_topk(q, c, k, "dot",
                            config=SearchConfig(selection="extract",
                                                precision="highest"),
                            interpret=True)
    rel_hi = abs(float(np.asarray(vals_hi)[0, 0]) - exact) / exact
    assert rel_hi < 1e-6, rel_hi  # exact f32: accumulation noise only


class TestBigK:
    """128 < k <= 1024: the big-k fused extension (round 4).  The carry/
    output width auto-raises in 128-lane groups (effective_k_pad); dense
    power-of-two scans run gstack with binomial-tail stack depths and a
    prune gate reading the first ceil(k/128) levels; everything else
    runs extract with k full extraction passes.  Beyond _MAX_FUSED_K
    dispatch still falls back to XLA."""

    def test_depth_math(self):
        from polars_matmul_tpu.kernels.fused_topk import (
            _MAX_FUSED_K, _bigk_depth, _bigk_gstack_ok, _bigk_tail)

        for k in (129, 200, 512, 1024):
            for cells in (128, 256, 128 * 123):
                levels = _bigk_depth(k, cells)
                # prune-gate floor: the gate reads level ceil(k/128)-1
                assert levels >= -(-k // 128) + 1, (k, cells, levels)
                assert levels <= 32
        # plentiful cells (2M-row corpus): k=1024 needs few extra levels
        assert _bigk_depth(1024, 128 * 123) <= 12
        # the tail target is genuinely met where auto picks gstack
        assert _bigk_tail(200, 256, _bigk_depth(200, 256)) <= 1e-7
        assert _bigk_gstack_ok(200, 200)
        assert not _bigk_gstack_ok(_MAX_FUSED_K + 1, 200)

    def test_effective_k_pad_and_supports(self):
        from polars_matmul_tpu.kernels.fused_topk import (
            effective_k_pad, supports)

        cfg = SearchConfig()
        assert effective_k_pad(100, cfg) == 128
        assert effective_k_pad(129, cfg) == 256
        assert effective_k_pad(1024, cfg) == 1024
        assert supports((8, 64), (4000, 64), np.float32, 1024, cfg)
        assert not supports((8, 64), (4000, 64), np.float32, 1025, cfg)

    @pytest.mark.parametrize("metric", ["cosine", "euclidean"])
    def test_extract_bigk_matches_oracle(self, metric):
        rng = np.random.default_rng(200)
        q = rng.standard_normal((4, 24)).astype(np.float32)
        c = rng.standard_normal((1000, 24)).astype(np.float32)
        cfg = SearchConfig(selection="extract")
        v1, i1 = fused_topk(q, c, 200, metric, config=cfg, interpret=True)
        v0, i0 = topk_search(q, c, 200, metric)
        assert_topk_equivalent(np.asarray(i1), np.asarray(v1),
                               np.asarray(i0), np.asarray(v0))

    def test_gstack_bigk_single_segment(self):
        rng = np.random.default_rng(201)
        q = rng.standard_normal((4, 16)).astype(np.float32)
        c = rng.standard_normal((3000, 16)).astype(np.float32)
        cfg = SearchConfig(selection="gstack")
        v1, i1 = fused_topk(q, c, 300, "dot", config=cfg, interpret=True)
        v0, i0 = topk_search(q, c, 300, "dot")
        assert_topk_equivalent(np.asarray(i1), np.asarray(v1),
                               np.asarray(i0), np.asarray(v0))

    def test_gstack_bigk_segmented_with_prune_and_mask(self):
        """> 16,384 padded rows (block_n=128 -> 157 tiles, 2 segments),
        prune on (the new ceil(k/128)-level gate actually gates), plus a
        row mask — exact vs the oracle."""
        rng = np.random.default_rng(202)
        q = rng.standard_normal((4, 16)).astype(np.float32)
        c = rng.standard_normal((20_000, 16)).astype(np.float32)
        mask = rng.random(20_000) < 0.8
        mask[:300] = True
        import jax.numpy as jnp

        cfg = SearchConfig(selection="gstack", block_q=8, block_n=128,
                           prune="on")
        v1, i1 = fused_topk(q, c, 200, "cosine", mask=mask, config=cfg,
                            interpret=True)
        v0, i0 = topk_search(q, c, 200, "cosine", mask=jnp.asarray(mask))
        assert_topk_equivalent(np.asarray(i1), np.asarray(v1),
                               np.asarray(i0), np.asarray(v0))

    def test_auto_routes_bigk(self):
        from polars_matmul_tpu.kernels.fused_topk import _resolve_selection

        # dense pow2 scan -> gstack; probed -> extract; k past the
        # envelope's viable depth or _MAX_FUSED_K -> extract
        assert _resolve_selection("auto", 200, 100, False, 7) == "gstack"
        assert _resolve_selection("auto", 200, 100, True, 7) == "extract"
        with pytest.raises(ValueError, match="supports k <= 128"):
            _resolve_selection("bucket", 200, 100, False, 7)

    def test_adversarial_collision_fires_exact_rerun(self):
        """Plant > depth near-duplicate winners at stride 128 (one lane
        class): the detection level must fire and the extract re-run must
        keep the result exact."""
        rng = np.random.default_rng(203)
        dim = 16
        c = rng.standard_normal((6000, dim)).astype(np.float32) * 0.01
        w = rng.standard_normal(dim).astype(np.float32)
        for j in range(40):  # 40 planted winners in lane class 0
            c[j * 128] = w * (1.0 + 1e-6 * j)
        q = np.stack([w, -w]).astype(np.float32)
        cfg = SearchConfig(selection="gstack")
        v1, i1 = fused_topk(q, c, 150, "dot", config=cfg, interpret=True)
        v0, i0 = topk_search(q, c, 150, "dot")
        assert_topk_equivalent(np.asarray(i1), np.asarray(v1),
                               np.asarray(i0), np.asarray(v0))

    def test_bigk_masked_underfilled_slots(self):
        """Fewer matching rows than k at k > 128: every unfilled slot
        must carry the (-inf, int32-max) sentinels, on both big-k
        routes (gstack fires its detection when the k-th best is dead
        and re-runs extract; extract emits sentinels directly)."""
        import jax.numpy as jnp

        rng = np.random.default_rng(204)
        q = rng.standard_normal((3, 16)).astype(np.float32)
        c = rng.standard_normal((3000, 16)).astype(np.float32)
        mask = np.zeros(3000, bool)
        live = rng.choice(3000, size=40, replace=False)
        mask[live] = True
        for sel in ("gstack", "extract"):
            v, i = fused_topk(q, c, 200, "dot", mask=mask,
                              config=SearchConfig(selection=sel),
                              interpret=True)
            v, i = np.asarray(v), np.asarray(i)
            assert (np.isin(i[:, :40], live)).all(), sel
            assert (i[:, 40:] == np.iinfo(np.int32).max).all(), sel
            assert np.isneginf(v[:, 40:]).all(), sel
            v0, i0 = topk_search(q, c, 200, "dot", mask=jnp.asarray(mask))
            # raw-dot scores are not unit scale: bf16x3's absolute error
            # grows with |score| (same scaling as the fuzz test)
            assert_topk_equivalent(i, v, np.asarray(i0), np.asarray(v0),
                                   rtol=2e-4, atol=1e-4)

    def test_bigk_fuzz(self):
        """Randomized big-k coverage: shapes off the tile grid, every
        metric, both routes, duplicates and zero rows sprinkled in."""
        import jax.numpy as jnp

        rng = np.random.default_rng(205)
        metrics = ["cosine", "dot", "euclidean"]
        for trial in range(6):
            n = int(rng.integers(300, 4000))
            d = int(rng.integers(8, 96))
            m = int(rng.integers(1, 12))
            k = int(rng.integers(129, min(n, 1024) + 1))
            metric = metrics[trial % 3]
            sel = ("auto", "extract", "gstack")[trial % 3]
            q = rng.standard_normal((m, d)).astype(np.float32)
            c = rng.standard_normal((n, d)).astype(np.float32)
            c[n // 2] = c[0]
            c[-1] = 0.0
            mask = None
            if trial % 2:
                mask = rng.random(n) < 0.8
                mask[rng.choice(n, size=min(k, n), replace=False)] = True
            try:
                v1, i1 = fused_topk(q, c, k, metric, mask=mask,
                                    config=SearchConfig(selection=sel),
                                    interpret=True)
            except ValueError:
                # explicit gstack outside its envelope (e.g. depth-capped
                # geometry) legitimately refuses; auto never does
                assert sel == "gstack"
                continue
            mk = None if mask is None else jnp.asarray(mask)
            v0, i0 = topk_search(q, c, k, metric, mask=mk)
            try:
                # big-k draws m*k score samples (thousands), so the
                # bf16x3 sqrt(d)-scaled absolute tail needs more room
                # than the small-k fuzz's 8e-6 multiplier
                assert_topk_equivalent(
                    np.asarray(i1), np.asarray(v1), np.asarray(i0),
                    np.asarray(v0), rtol=2e-4, atol=8e-6 + 2e-5 * d ** 0.5)
            except AssertionError as e:
                raise AssertionError(
                    f"trial {trial}: m={m} n={n} d={d} k={k} {metric} "
                    f"{sel}: {e}") from e
