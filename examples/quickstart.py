"""Quickstart: the README walkthrough as a runnable script.

Uses the Polars `.pmm` namespace when polars is installed, otherwise the
equivalent Arrow / NumPy surface (the engine underneath is identical).
Mirrors the reference's README example (reference README.md:55-65).
"""

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import polars_matmul_tpu as pmt  # noqa: E402


QUERIES = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
CORPUS = [[0.9, 0.1, 0.0], [0.1, 0.9, 0.0], [0.0, 0.1, 0.9]]


def with_polars():
    import polars as pl

    queries = pl.DataFrame({"id": [0, 1, 2], "embedding": QUERIES})
    corpus = pl.DataFrame({"embedding": CORPUS, "label": ["a", "b", "c"]})
    out = queries.with_columns(
        pl.col("embedding").pmm.topk(corpus["embedding"], k=2)
        .alias("matches")
    )
    print(out)


def with_arrow():
    import pyarrow as pa

    q = pa.array(QUERIES)
    c = pa.array(CORPUS)
    matches = pmt.topk_arrow(q, c, k=2)
    for row_id, row in enumerate(matches.to_pylist()):
        print(f"query {row_id}: {row}")


def with_numpy():
    q = np.asarray(QUERIES, dtype=np.float32)
    c = np.asarray(CORPUS, dtype=np.float32)

    idx, scores = pmt.topk(q, c, k=2)           # one-shot
    print("one-shot indices:\n", idx)

    handle = pmt.Corpus(c)                       # resident corpus
    idx2, scores2 = handle.topk(q, k=2)
    assert np.array_equal(idx, idx2)
    print("scores:\n", np.round(scores, 4))


if __name__ == "__main__":
    try:
        import polars  # noqa: F401
    except ImportError:
        print("(polars not installed; using the Arrow surface)")
        with_arrow()
    else:
        with_polars()
    with_numpy()
