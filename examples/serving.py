"""Serving pattern: resident corpus, batch accumulation, filtered queries.

Shows the intended production loop (SURVEY.md §5 resident-corpus design):
upload + prepare the corpus once, then serve query batches against it —
optionally with per-request corpus filters — and read one packed result
per batch.  Run on any backend; sizes scale down automatically off-TPU.
"""

import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import polars_matmul_tpu as pmt  # noqa: E402


def main():
    import jax

    on_tpu = jax.default_backend() == "tpu"
    n, dim, k = (200_000, 256, 10) if on_tpu else (5_000, 64, 10)
    batch = 512

    rng = np.random.default_rng(0)
    corpus_emb = rng.standard_normal((n, dim)).astype(np.float32)
    # a categorical attribute to filter on per request
    category = rng.integers(0, 8, size=n)

    print(f"corpus {n}x{dim} on {jax.default_backend()}; "
          f"uploading + preparing once...")
    t0 = time.perf_counter()
    corpus = pmt.Corpus(corpus_emb)
    # warm the prepared cache for the metric we serve
    corpus.topk(corpus_emb[:1], 1, "cosine")
    print(f"  ready in {time.perf_counter() - t0:.1f}s")

    # steady-state serving loop
    lat = []
    for req in range(5):
        queries = rng.standard_normal((batch, dim)).astype(np.float32)
        want = req % 8  # this request only wants category == want
        t0 = time.perf_counter()
        idx, scores = corpus.topk(queries, k, "cosine",
                                  mask=category == want)
        lat.append(time.perf_counter() - t0)
        assert (category[idx.reshape(-1)] == want).all()
        print(f"  request {req}: {batch} queries (category {want}) "
              f"in {lat[-1]*1e3:.1f} ms; "
              f"top hit score {scores[0, 0]:.4f}")

    qps = batch / min(lat)
    print(f"steady-state: {qps:,.0f} queries/s per batch-call "
          f"(transport-bound off-chip; see bench.py for device rates)")


if __name__ == "__main__":
    main()
