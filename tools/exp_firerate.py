"""Exact-fallback fire rates on clustered / duplicate-heavy corpora.

VERDICT r02 item 6: bucket/gstack fallback rates were characterized only
on random data; on clustered or duplicate-heavy corpora collisions could
concentrate in one lane class and fire the exact re-run per call.

The fire conditions are pure functions of the exact score matrix, so the
rates are computed here in NumPy — no device needed:

  gpop/gstack (single segment): a row fires iff >= n_levels of its
     scores-at-or-above-its-kth-best land in ONE lane class
     (class = corpus_index mod 128); the batch re-runs iff any row fires.
  segmented gstack: same with (segment, class) cells
     (segment = corpus_index div 16384).
  bucket: per (query-block, tile): >= 3 of a row's scores >= its RUNNING
     k-th best (after merging that tile) in one tile-class — simulated
     tile by tile; each fire costs one full-width extract on THAT tile
     (in-kernel static region), not a whole re-run.

Data classes: random gaussian; blobs in cluster-contiguous order (the
ClusteredCorpus layout); blobs in shuffled order; every row duplicated
8x at random positions; adversarial stride-128 duplicates (same class by
construction).

Run: python tools/exp_firerate.py   (CPU, ~1 min)
"""
import json

import numpy as np

LANES = 128
SEG_ROWS = LANES * LANES


def fire_gpop(s, k, n_levels):
    """P(batch fires) + row fire count for the cross-tile stack designs."""
    m, n = s.shape
    kth = -np.partition(-s, k - 1, axis=1)[:, k - 1:k]
    classes = (np.arange(n) % LANES)
    fires = 0
    for r in range(m):
        ge = s[r] >= kth[r, 0]
        cnt = np.bincount(classes[ge], minlength=LANES)
        if cnt.max() >= n_levels:
            fires += 1
    return fires


def fire_gstack_seg(s, k, n_levels):
    m, n = s.shape
    kth = -np.partition(-s, k - 1, axis=1)[:, k - 1:k]
    cells = (np.arange(n) // SEG_ROWS) * LANES + (np.arange(n) % LANES)
    n_cells = int(cells.max()) + 1
    fires = 0
    for r in range(m):
        ge = s[r] >= kth[r, 0]
        cnt = np.bincount(cells[ge], minlength=n_cells)
        if cnt.max() >= n_levels:
            fires += 1
    return fires


def fire_bucket(s, k, tile=2048, block=256):
    """# of (query-block, tile) pairs that route through the in-tile
    extract fallback, simulated with the kernel's merge order."""
    m, n = s.shape
    n_tiles = (n + tile - 1) // tile
    pairs = fired = 0
    for b0 in range(0, m, block):
        rows = slice(b0, min(b0 + block, m))
        sb = s[rows]
        carry = np.full((sb.shape[0], k), -np.inf)
        for t in range(n_tiles):
            st = sb[:, t * tile:(t + 1) * tile]
            classes = np.arange(st.shape[1]) % LANES
            # per-class best-2 candidates merged into the carry
            m3 = np.full((st.shape[0], LANES), -np.inf)
            cand = np.full((st.shape[0], 2 * LANES), -np.inf)
            for c in range(LANES):
                cols = st[:, classes == c]
                if cols.shape[1] == 0:
                    continue
                top3 = -np.partition(-cols, min(2, cols.shape[1] - 1),
                                     axis=1)[:, :3]
                cand[:, c] = top3[:, 0]
                if top3.shape[1] > 1:
                    cand[:, LANES + c] = top3[:, 1]
                if top3.shape[1] > 2:
                    m3[:, c] = top3[:, 2]
            merged = np.concatenate([carry, cand], axis=1)
            carry = -np.partition(-merged, k - 1, axis=1)[:, :k]
            kth = carry[:, k - 1:k]
            fired += int(np.any(m3 >= kth, axis=1).any())
            pairs += 1
    return fired, pairs


def datasets(rng, n=40_960, d=64, m=512):
    q = rng.standard_normal((m, d)).astype(np.float32)
    yield "random", q, rng.standard_normal((n, d)).astype(np.float32)
    centers = rng.standard_normal((64, d)).astype(np.float32)
    ids = rng.integers(0, 64, size=n)
    blobs = (centers[ids]
             + 0.3 * rng.standard_normal((n, d)).astype(np.float32))
    order = np.argsort(ids, kind="stable")
    qb = (centers[rng.integers(0, 64, size=m)]
          + 0.3 * rng.standard_normal((m, d)).astype(np.float32))
    yield "blobs-contiguous", qb, blobs[order]
    yield "blobs-shuffled", qb, blobs
    base = rng.standard_normal((n // 8, d)).astype(np.float32)
    dup = base[rng.integers(0, n // 8, size=n)]
    yield "dup8-random-pos", q, dup
    adv = rng.standard_normal((n, d)).astype(np.float32)
    hot = rng.standard_normal(d).astype(np.float32)
    adv[np.arange(16) * LANES] = hot + 0.01 * rng.standard_normal(
        (16, d)).astype(np.float32)
    yield "stride128-neardup", hot[None, :].repeat(m, 0).astype(
        np.float32), adv


def main():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from polars_matmul_tpu.kernels.fused_topk import _gstack_geometry

    rng = np.random.default_rng(5)
    k = 10
    for name, q, c in datasets(rng):
        total_groups = -(-c.shape[0] // LANES)
        _, _, _, n_levels, _ = _gstack_geometry(total_groups, k)
        _, _, _, n_levels_seg, _ = _gstack_geometry(total_groups, 100)
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-9)
        cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-9)
        s = (qn @ cn.T).astype(np.float32)
        g = fire_gpop(s, k, n_levels)
        seg = fire_gstack_seg(s, 100, n_levels_seg)
        bf, bp = fire_bucket(s, k)
        print(json.dumps({
            "data": name, "rows": int(c.shape[0]), "queries": int(q.shape[0]),
            "gpop_levels": int(n_levels),
            "gstack_seg_levels": int(n_levels_seg),
            "gpop_row_fires": int(g),
            "gpop_batch_fire": bool(g > 0),
            "gstack_seg_k100_row_fires": int(seg),
            "bucket_tile_fires": f"{bf}/{bp}",
        }), flush=True)


if __name__ == "__main__":
    main()
