"""Polars ``.pmm`` expression namespace.

Byte-compatible with the reference surface (reference
python/polars_matmul/__init__.py:39-196): importing the package registers the
namespace on ``pl.Expr`` (side-effect-on-import design, SURVEY.md §3.4);
``topk(corpus, k, metric="cosine")`` returns
``List[Struct{index: u32, score: f64}]``; ``matmul(corpus, flatten=False)``
returns ``Array[f32|f64, n_corpus]`` or a flat column.

The Series crosses into the engine via Arrow (``Series.to_arrow`` is
zero-copy), replacing the reference's pyo3 FFI layer — JAX is Python-native,
so there is no FFI to write (SURVEY.md §2.2).

This module imports only when polars is installed; the rest of the package
works without it (the Arrow/NumPy API in ``arrow_ops``/``search``).
"""

from __future__ import annotations

from typing import Literal

import polars as pl

from .arrow_ops import matmul_arrow, topk_arrow
from .clustered import ClusteredCorpus
from .search import Corpus

MetricName = Literal["cosine", "dot", "euclidean"]

_TOPK_DTYPE = pl.List(pl.Struct({"index": pl.UInt32, "score": pl.Float64}))


def _series_to_arrow(s: pl.Series):
    return s.to_arrow()


def _from_arrow(arr, name: str) -> pl.Series:
    out = pl.from_arrow(arr)
    return out.rename(name)


@pl.api.register_expr_namespace("pmm")
class PmmNamespace:
    """Polars Expression API for similarity search operations.

    Registered automatically when you import ``polars_matmul_tpu``.

    Example:
        >>> import polars as pl
        >>> import polars_matmul_tpu  # registers .pmm namespace
        >>> df.with_columns(
        ...     pl.col("embedding").pmm.topk(corpus["embedding"], k=5)
        ... )
    """

    def __init__(self, expr: pl.Expr):
        self._expr = expr

    def topk(
        self,
        corpus: pl.Series,
        k: int,
        metric: MetricName = "cosine",
        *,
        mask: "pl.Series | None" = None,
        probe: "float | int | None" = None,
    ) -> pl.Expr:
        """Find top-k similar corpus items per embedding.

        Returns ``List[Struct{index: u32, score: f64}]`` (reference
        __init__.py:63-119 contract: cosine default, euclidean lower-is-
        better, k clamped to corpus size).  ``mask`` is an optional boolean
        Series over the corpus rows for filtered search (nulls excluded).

        ``corpus`` may also be a resident ``polars_matmul_tpu.Corpus``
        or ``ClusteredCorpus`` handle (e.g. ``Corpus.from_arrow(
        df["embedding"])``): the corpus is uploaded and prepared once,
        and every expression evaluation only moves the queries — the
        serving pattern.  ``probe=`` (ClusteredCorpus only) bounds the
        corpus tiles each query block visits.
        """
        if isinstance(corpus, pl.Expr):
            raise TypeError(
                "corpus must be a Polars Series, not an Expression. "
                "Use corpus['column_name'] or "
                "corpus.get_column('column_name')."
            )
        corpus_arrow = (corpus
                        if isinstance(corpus, (Corpus, ClusteredCorpus))
                        else _series_to_arrow(corpus))
        mask_arrow = None if mask is None else _series_to_arrow(mask)

        def _run(s: pl.Series) -> pl.Series:
            out = topk_arrow(_series_to_arrow(s), corpus_arrow, k, metric,
                             mask=mask_arrow, probe=probe)
            return _from_arrow(out, "topk")

        return self._expr.map_batches(
            _run,
            is_elementwise=True,
            return_dtype=_TOPK_DTYPE,
        )

    def matmul(
        self,
        corpus: pl.Series,
        flatten: bool = False,
    ) -> pl.Expr:
        """All pairwise dot products against ``corpus``.

        ``flatten=True`` returns the (n_queries * n_corpus) row-major flat
        column (length-changing expression, reference __init__.py:177-187).
        ``corpus`` may be a resident ``Corpus`` or ``ClusteredCorpus``
        handle, like ``topk``.
        """
        if isinstance(corpus, pl.Expr):
            raise TypeError(
                "corpus must be a Polars Series, not an Expression. "
                "Use corpus['column_name'] or "
                "corpus.get_column('column_name')."
            )
        if isinstance(corpus, (Corpus, ClusteredCorpus)):
            corpus_arrow = corpus
            n_corpus = corpus.n
        else:
            corpus_arrow = _series_to_arrow(corpus)
            n_corpus = len(corpus)
        # Declared dtype follows the corpus inner dtype, like the reference
        # (__init__.py:165-171). The closure casts the computed result to the
        # declared dtype so mixed f32/f64 inputs cannot desync declaration
        # from data (the reference quirk SURVEY.md §3.2 says not to copy).
        try:
            if isinstance(corpus, (Corpus, ClusteredCorpus)):
                import numpy as _np

                is_f32 = corpus.dtype == _np.float32
            else:
                is_f32 = corpus.dtype.inner == pl.Float32
        except Exception:
            is_f32 = False
        inner_dtype = pl.Float32 if is_f32 else pl.Float64

        if flatten:
            def _run_flat(s: pl.Series) -> pl.Series:
                out = matmul_arrow(
                    _series_to_arrow(s), corpus_arrow, flatten=True
                )
                return _from_arrow(out, "matmul").cast(inner_dtype)

            return self._expr.map_batches(
                _run_flat,
                is_elementwise=False,  # output length differs from input
                return_dtype=inner_dtype,
            )

        dtype = pl.Array(inner_dtype, n_corpus)

        def _run(s: pl.Series) -> pl.Series:
            out = matmul_arrow(_series_to_arrow(s), corpus_arrow)
            return _from_arrow(out, "matmul").cast(dtype)

        return self._expr.map_batches(
            _run,
            is_elementwise=True,
            return_dtype=dtype,
        )
