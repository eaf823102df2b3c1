"""Pinned-fixture parity (SURVEY.md §4 tier d): expected outputs generated
once from a pure-NumPy implementation of the reference's published
semantics (metrics.rs eps guards, both-f32 rule, lowest-index-wins ties)
and committed under tests/fixtures/.  Our public API must reproduce them."""

import os

import numpy as np
import pytest

import polars_matmul_tpu as pmt

from conftest import assert_topk_equivalent

_FIX = os.path.join(os.path.dirname(__file__), "fixtures",
                    "reference_topk.npz")


@pytest.fixture(scope="module")
def fixtures():
    return np.load(_FIX)


@pytest.mark.parametrize("case,metric,k", [
    ("cosine_f32", "cosine", 7),
    ("dot_f32", "dot", 5),
    ("euclidean_f32", "euclidean", 5),
    ("cosine_f64", "cosine", 4),
])
def test_pinned_reference_outputs(fixtures, case, metric, k):
    q = fixtures[f"{case}_q"]
    c = fixtures[f"{case}_c"]
    want_idx = fixtures[f"{case}_idx"]
    want_scores = fixtures[f"{case}_scores"]
    idx, scores = pmt.topk(q, c, k, metric)
    assert_topk_equivalent(idx.astype(np.int64), scores,
                           want_idx.astype(np.int64), want_scores)
