"""Similarity / distance metric definitions.

Mirrors the semantics of the reference ``Metric`` enum
(reference src/metrics.rs:10-36): three metrics, case-insensitive parsing,
``"l2"`` accepted as an alias for euclidean, and a sort-direction policy
(higher-is-better for similarities, lower-is-better for distances).
"""

from __future__ import annotations

import enum


class Metric(enum.Enum):
    COSINE = "cosine"
    DOT = "dot"
    EUCLIDEAN = "euclidean"

    @classmethod
    def parse(cls, s: str) -> "Metric":
        """Parse a metric string (reference metrics.rs:20-27 semantics)."""
        if isinstance(s, Metric):
            return s
        low = str(s).lower()
        if low == "cosine":
            return cls.COSINE
        if low == "dot":
            return cls.DOT
        if low in ("euclidean", "l2"):
            return cls.EUCLIDEAN
        raise ValueError(
            f"Unknown metric: '{s}'. Supported: cosine, dot, euclidean"
        )

    @property
    def higher_is_better(self) -> bool:
        """True for similarities, False for distances
        (reference metrics.rs:30-35)."""
        return self is not Metric.EUCLIDEAN


def cosine_eps(dtype) -> float:
    """Zero-norm guard epsilon.

    The reference uses 1e-10 for f64 (metrics.rs:277,280) and 1e-6 for f32
    (metrics.rs:331,334); rows/columns with norm <= eps get score 0.0.
    """
    import numpy as np

    return 1e-6 if np.dtype(dtype) == np.float32 else 1e-10
