"""Tier-1 tests: metric semantics + pure-JAX oracle vs NumPy.

Mirrors the reference's Rust unit tests (metrics.rs:395-435, topk.rs:77-126)
plus the NumPy-oracle strategy of its Python suite (SURVEY.md §4).
"""

import numpy as np
import pytest

from polars_matmul_tpu.ops import Metric, pairwise_scores, topk_search
from polars_matmul_tpu.ops.reference import topk_from_scores


class TestMetricParsing:
    def test_parse(self):
        assert Metric.parse("cosine") is Metric.COSINE
        assert Metric.parse("COSINE") is Metric.COSINE
        assert Metric.parse("dot") is Metric.DOT
        assert Metric.parse("euclidean") is Metric.EUCLIDEAN
        assert Metric.parse("l2") is Metric.EUCLIDEAN
        assert Metric.parse("L2") is Metric.EUCLIDEAN

    def test_unknown_metric(self):
        with pytest.raises(ValueError, match="Unknown metric"):
            Metric.parse("manhattan")

    def test_direction(self):
        assert Metric.COSINE.higher_is_better
        assert Metric.DOT.higher_is_better
        assert not Metric.EUCLIDEAN.higher_is_better


class TestPairwiseScores:
    def test_dot_toy(self):
        # reference metrics.rs test_dot_product_f64
        q = np.array([[1.0, 0.0], [0.0, 1.0]])
        c = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
        s = np.asarray(pairwise_scores(q, c, Metric.DOT))
        assert abs(s[0, 0] - 1.0) < 1e-10
        assert abs(s[0, 1] - 0.0) < 1e-10
        assert abs(s[1, 1] - 1.0) < 1e-10

    def test_cosine_toy(self):
        # reference metrics.rs test_cosine_similarity
        q = np.array([[1.0, 0.0], [0.0, 1.0]])
        c = np.array([[2.0, 0.0], [0.0, 3.0]])
        s = np.asarray(pairwise_scores(q, c, Metric.COSINE))
        assert abs(s[0, 0] - 1.0) < 1e-10
        assert abs(s[1, 1] - 1.0) < 1e-10
        assert abs(s[1, 0] - 0.0) < 1e-10

    def test_cosine_vs_numpy(self, qc_f64):
        q, c = qc_f64
        s = np.asarray(pairwise_scores(q, c, Metric.COSINE))
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        cn = c / np.linalg.norm(c, axis=1, keepdims=True)
        np.testing.assert_allclose(s, qn @ cn.T, rtol=1e-9)

    def test_euclidean_vs_numpy(self, qc_f64):
        q, c = qc_f64
        s = np.asarray(pairwise_scores(q, c, Metric.EUCLIDEAN))
        exp = np.sqrt(
            np.maximum(
                (q * q).sum(1)[:, None]
                + (c * c).sum(1)[None, :]
                - 2 * q @ c.T,
                0.0,
            )
        )
        np.testing.assert_allclose(s, exp, rtol=1e-7, atol=1e-9)

    def test_cosine_zero_norm_guard(self):
        # reference metrics.rs:275-289: degenerate rows/cols score exactly 0
        q = np.array([[0.0, 0.0], [1.0, 0.0]])
        c = np.array([[1.0, 0.0], [0.0, 0.0]])
        s = np.asarray(pairwise_scores(q, c, Metric.COSINE))
        assert s[0, 0] == 0.0 and s[0, 1] == 0.0  # zero-norm query row
        assert s[1, 1] == 0.0  # zero-norm corpus col
        assert abs(s[1, 0] - 1.0) < 1e-12

    def test_f32_eps(self):
        # f32 guard is 1e-6 (metrics.rs:331): norm just above must survive
        v = np.float32(1e-5)
        q = np.array([[v, 0.0]], dtype=np.float32)
        c = np.array([[v, 0.0]], dtype=np.float32)
        s = np.asarray(pairwise_scores(q, c, Metric.COSINE))
        assert abs(s[0, 0] - 1.0) < 1e-4


class TestTopkSearch:
    def test_toy_directions(self):
        # reference topk.rs:83-125 hand-built score matrices
        scores = np.array([[0.1, 0.9, 0.5], [0.8, 0.2, 0.6]])
        _, idx = topk_from_scores(np.asarray(scores), 2, True)
        idx = np.asarray(idx)
        assert idx[0].tolist() == [1, 2]
        assert idx[1].tolist() == [0, 2]
        _, idx = topk_from_scores(np.asarray(scores), 2, False)
        idx = np.asarray(idx)
        assert idx[0].tolist() == [0, 2]
        assert idx[1].tolist() == [1, 2]

    def test_tie_break_lowest_index(self):
        # SURVEY.md §7 hard part #1: ties are lowest-index-wins
        scores = np.array([[0.5, 0.7, 0.7, 0.5]])
        _, idx = topk_from_scores(np.asarray(scores), 4, True)
        assert np.asarray(idx)[0].tolist() == [1, 2, 0, 3]

    def test_vs_numpy_oracle(self, qc_f64):
        q, c = qc_f64
        k = 10
        vals, idx = topk_search(q, c, k, Metric.COSINE)
        vals, idx = np.asarray(vals), np.asarray(idx)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        cn = c / np.linalg.norm(c, axis=1, keepdims=True)
        full = qn @ cn.T
        exp_idx = np.argsort(-full, axis=1, kind="stable")[:, :k]
        np.testing.assert_array_equal(idx, exp_idx)
        np.testing.assert_allclose(
            vals, np.take_along_axis(full, exp_idx, 1), rtol=1e-9
        )

    def test_euclidean_ascending(self, qc_f64):
        q, c = qc_f64
        vals = np.asarray(topk_search(q, c, 5, Metric.EUCLIDEAN)[0])
        assert (np.diff(vals, axis=1) >= 0).all()

    def test_scores_sorted_best_first(self, qc_f64):
        q, c = qc_f64
        vals = np.asarray(topk_search(q, c, 5, Metric.COSINE)[0])
        assert (np.diff(vals, axis=1) <= 0).all()
