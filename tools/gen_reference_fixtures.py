"""Regenerate tests/fixtures/reference_topk.npz.

Pins expected outputs computed by a pure-NumPy implementation of the
reference's published semantics (reference src/metrics.rs:258-365 eps
guards, src/matmul.rs:13-19 both-f32 rule, lowest-index-wins ties as the
SURVEY.md §7 contract).  Run from the repo root:

    python tools/gen_reference_fixtures.py
"""

import numpy as np

rng = np.random.default_rng(20260816)
cases = {}


def topk_ref(q, c, k, metric):
    f32 = q.dtype == np.float32 and c.dtype == np.float32
    wt = np.float32 if f32 else np.float64
    qq, cc = q.astype(wt), c.astype(wt)
    d = qq @ cc.T
    if metric == "cosine":
        eps = wt(1e-6 if f32 else 1e-10)
        qn = np.sqrt((qq * qq).sum(1))
        cn = np.sqrt((cc * cc).sum(1))
        ok = (qn[:, None] > eps) & (cn[None, :] > eps)
        s = np.where(ok, d / np.where(ok, qn[:, None] * cn[None, :], 1), 0.0)
        hib = True
    elif metric == "dot":
        s, hib = d, True
    else:
        s = np.sqrt(np.maximum(
            (qq * qq).sum(1)[:, None] + (cc * cc).sum(1)[None, :] - 2 * d, 0))
        hib = False
    key = -s if hib else s
    idx = np.argsort(key, axis=1, kind="stable")[:, :k]
    return (idx.astype(np.uint32),
            np.take_along_axis(s, idx, 1).astype(np.float64))


def main():
    for name, (m, n, d, k, metric, dt) in {
        "cosine_f32": (30, 400, 48, 7, "cosine", np.float32),
        "dot_f32": (12, 250, 32, 5, "dot", np.float32),
        "euclidean_f32": (12, 250, 32, 5, "euclidean", np.float32),
        "cosine_f64": (10, 120, 24, 4, "cosine", np.float64),
    }.items():
        q = rng.standard_normal((m, d)).astype(dt)
        c = rng.standard_normal((n, d)).astype(dt)
        c[5] = c[0]        # exact duplicate -> tie-break coverage
        c[6] = 0.0         # zero corpus row -> eps guard
        q[1] = 0.0         # zero query row -> eps guard
        idx, scores = topk_ref(q, c, k, metric)
        cases[f"{name}_q"] = q
        cases[f"{name}_c"] = c
        cases[f"{name}_idx"] = idx
        cases[f"{name}_scores"] = scores
    np.savez_compressed("tests/fixtures/reference_topk.npz", **cases)
    print("wrote", len(cases) // 4, "cases")


if __name__ == "__main__":
    main()
