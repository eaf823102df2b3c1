"""Stateful lifecycle fuzz: random add/update/delete/save/load sequences
against a shadow NumPy model.

The mutation machinery is the subtlest code in the package (donated
in-place writes, aliased prepared forms, identity-deduped bias rows,
capacity growth) — randomized interleavings catch ordering bugs that
handpicked sequences miss.  Small sizes keep it CPU-cheap.
"""

import numpy as np
import pytest

import polars_matmul_tpu as pmt


def _oracle_topk(q, c, k, alive, metric):
    """(idx, full score matrix in maximize orientation)."""
    if metric == "euclidean":
        d = np.sqrt(np.maximum(
            (q * q).sum(1)[:, None] + (c * c).sum(1)[None, :]
            - 2.0 * q @ c.T, 0.0))
        s = np.where(alive[None, :], -d, -np.inf)
    else:
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-30)
        s = qn @ cn.T if metric == "cosine" else q @ c.T
        s = np.where(alive[None, :], s, -np.inf)
    idx = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return idx, s


@pytest.mark.parametrize("storage", ["f32", "bf16", "int8", "int4"])
def test_lifecycle_fuzz(storage, tmp_path):
    import zlib

    rng = np.random.default_rng(zlib.crc32(storage.encode()))
    dim, k = 24, 4
    c = rng.standard_normal((60, dim)).astype(np.float32)
    h = pmt.Corpus(c, storage=storage, capacity=100)
    shadow = c.copy()
    alive = np.ones(60, bool)
    metrics = ["cosine", "dot", "euclidean"]

    for step in range(30):
        op = rng.integers(0, 6)
        n = shadow.shape[0]
        if op == 0 and n < 400:                       # add
            m = int(rng.integers(1, 8))
            rows = rng.standard_normal((m, dim)).astype(np.float32)
            assert h.add(rows) == n + m
            shadow = np.vstack([shadow, rows])
            alive = np.concatenate([alive, np.ones(m, bool)])
        elif op == 1:                                 # update (unique idx)
            m = int(rng.integers(1, min(6, n)))
            idx = rng.choice(n, size=m, replace=False)
            rows = rng.standard_normal((m, dim)).astype(np.float32)
            h.update(idx, rows)
            shadow[idx] = rows
            alive[idx] = True                         # upsert revives
        elif op == 2 and alive.sum() > k + 2:         # delete
            m = int(rng.integers(1, 3))
            idx = rng.choice(np.nonzero(alive)[0], size=m, replace=False)
            h.delete(idx)
            alive[idx] = False
        elif op == 3:                                 # save/load round-trip
            p = tmp_path / f"fz_{storage}_{step}.npz"
            h.save(p)
            h = pmt.Corpus.load(p, capacity=max(400, n))
        # op 4/5: plain queries (checked below every step)

        q = rng.standard_normal((3, dim)).astype(np.float32)
        metric = metrics[step % 3]
        i, v = h.topk(q, k, metric)
        # quantized storages rank the quantized values; compare against
        # the oracle on the handle's own served values
        if storage == "f32":
            ref = shadow
        elif storage == "bf16":
            import ml_dtypes

            ref = shadow.astype(ml_dtypes.bfloat16).astype(np.float32)
        elif storage == "int8":
            from polars_matmul_tpu.api.search import _quantize_rows_np

            codes, scales = _quantize_rows_np(shadow)
            ref = codes.astype(np.float32) * scales[:, None]
        else:
            from polars_matmul_tpu.api.search import (
                _quantize_rows_int4_np, _unpack_int4_np)
            from polars_matmul_tpu.kernels.fused_topk import (
                feature_geometry)

            ck, dpp, _ = feature_geometry(dim)
            packed, scales = _quantize_rows_int4_np(shadow, ck, dpp)
            codes = _unpack_int4_np(packed, ck, dim)
            ref = codes.astype(np.float32) * scales[:, None]
        i0, smat = _oracle_topk(q, ref, k, alive, metric)
        # index mismatches are acceptable only between near-tied scores
        # (quantized storages rank bf16x-split scores that differ from
        # the host oracle in the last bits)
        mism = i != i0
        if mism.any():
            r, col = np.nonzero(mism)
            sa = smat[r, i[r, col]]
            sb = smat[r, i0[r, col]]
            assert np.allclose(sa, sb, rtol=1e-2, atol=1e-2), (
                f"step {step} op {op} metric {metric} n={n} "
                f"alive={alive.sum()}: non-tied index mismatch\n{i}\nvs\n{i0}"
            )
        # deleted rows must never surface
        assert alive[i.reshape(-1)].all() or not (~alive).any()


@pytest.mark.parametrize("storage", ["f32", "int8"])
def test_lifecycle_fuzz_clustered(storage, tmp_path):
    """Same shadow-model fuzz over ClusteredCorpus: the permuted layout
    (slack refill, tile growth, freed holes) is the subtle machinery
    here.  Exhaustive queries must match the oracle exactly; probed
    queries must return exact scores over whatever they visited."""
    _run_clustered_fuzz(storage, tmp_path, mesh=None)


@pytest.mark.parametrize("storage", ["f32", "int8"])
def test_lifecycle_fuzz_clustered_mesh(storage, tmp_path):
    """The clustered fuzz with the corpus sharded over 8 devices: add is
    a host gather + re-shard, update an in-place sharded scatter (rows
    keep their permuted slots), rebuild/load re-shard the new layout."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    _run_clustered_fuzz(storage, tmp_path, mesh=pmt.make_mesh(1, 8))


def _run_clustered_fuzz(storage, tmp_path, mesh):
    import zlib

    from polars_matmul_tpu.config import SearchConfig

    rng = np.random.default_rng(zlib.crc32(
        ("cl" + storage + ("m" if mesh is not None else "")).encode()))
    dim, k = 16, 4
    cfg = SearchConfig(block_q=8, block_n=128)
    c = rng.standard_normal((300, dim)).astype(np.float32)
    h = pmt.ClusteredCorpus(c, clusters=5, storage=storage, config=cfg,
                            mesh=mesh)
    shadow = c.copy()
    alive = np.ones(300, bool)
    metrics = ["cosine", "dot", "euclidean"]

    for step in range(25):
        op = rng.integers(0, 6)
        n = shadow.shape[0]
        if op == 0 and n < 800:                       # add
            m = int(rng.integers(1, 10))
            rows = rng.standard_normal((m, dim)).astype(np.float32)
            assert h.add(rows) == n + m
            shadow = np.vstack([shadow, rows])
            alive = np.concatenate([alive, np.ones(m, bool)])
        elif op == 1:                                 # update (moves rows)
            m = int(rng.integers(1, 8))
            idx = rng.choice(n, size=m, replace=False)
            rows = rng.standard_normal((m, dim)).astype(np.float32)
            h.update(idx, rows)
            shadow[idx] = rows
            alive[idx] = True
        elif op == 2 and alive.sum() > k + 2:         # delete
            m = int(rng.integers(1, 4))
            idx = rng.choice(np.nonzero(alive)[0], size=m, replace=False)
            h.delete(idx)
            alive[idx] = False
        elif op == 3:                                 # save/load round-trip
            p = tmp_path / f"fzc_{storage}_{step}.npz"
            h.save(p)
            h = pmt.ClusteredCorpus.load(p, config=cfg, mesh=mesh)
        elif op == 4 and step % 2:                    # re-cluster (native)
            h.rebuild(clusters=int(rng.integers(2, 9)), seed=step)

        # layout invariants hold after every op
        lay = h.layout
        live = lay.perm >= 0
        assert np.array_equal(np.sort(lay.perm[live]),
                              np.arange(shadow.shape[0]))
        assert np.array_equal(lay.perm[lay.row_pos],
                              np.arange(shadow.shape[0]))
        assert int(lay.counts.sum()) == shadow.shape[0]

        q = rng.standard_normal((3, dim)).astype(np.float32)
        metric = metrics[step % 3]
        i, v = h.topk(q, k, metric)                   # exhaustive
        if storage == "f32":
            ref = shadow
        else:
            from polars_matmul_tpu.api.search import _quantize_rows_np

            codes, scales = _quantize_rows_np(shadow)
            ref = codes.astype(np.float32) * scales[:, None]
        i0, smat = _oracle_topk(q, ref, k, alive, metric)
        mism = i != i0
        if mism.any():
            r, col = np.nonzero(mism)
            sa = smat[r, i[r, col]]
            sb = smat[r, i0[r, col]]
            assert np.allclose(sa, sb, rtol=1e-2, atol=1e-2), (
                f"step {step} op {op} metric {metric}: "
                f"non-tied index mismatch\n{i}\nvs\n{i0}"
            )
        assert alive[i.reshape(-1)].all() or not (~alive).any()

        # probed: exact scores over the visited subset, deletions honored
        pi, pv = h.topk(q, k, metric, probe=0.5)
        big = np.iinfo(np.int32).max
        real = pi != big
        assert alive[pi[real].astype(np.int64)].all() \
            or not (~alive).any()
        sign = -1.0 if metric == "euclidean" else 1.0
        for r in range(3):
            for col in range(k):
                if not real[r, col]:
                    continue
                want = smat[r, pi[r, col]]
                got = sign * pv[r, col]
                if metric == "euclidean":
                    got = -abs(pv[r, col])
                    want = smat[r, pi[r, col]]
                assert abs(got - want) < 5e-2 + 1e-2 * abs(want), (
                    f"step {step} probed score drift at ({r},{col})"
                )

@pytest.mark.parametrize("storage", ["f32", "bf16", "int8", "int4"])
def test_lifecycle_fuzz_mesh(storage, tmp_path):
    """Shadow-model fuzz for the mesh-sharded mutation surface:
    add (within capacity) / update / delete / save / load on an 8-shard
    corpus, across every storage tier.  The subtle machinery is the
    sharded scatter + the per-shard prepared-form patching (the bf16
    float-branch and int4 nibble-width patches each have their own
    failure modes)."""
    import zlib

    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    mesh = pmt.make_mesh(1, 8)

    rng = np.random.default_rng(zlib.crc32(("mesh" + storage).encode()))
    dim, k = 24, 4
    c = rng.standard_normal((120, dim)).astype(np.float32)
    h = pmt.Corpus(c, storage=storage, mesh=mesh, capacity=400)
    shadow = c.copy()
    alive = np.ones(120, bool)
    metrics = ["cosine", "dot", "euclidean"]

    for step in range(20):
        op = rng.integers(0, 6)
        n = shadow.shape[0]
        if op == 5 and n < 380:                       # add (capacity)
            m = int(rng.integers(1, 8))
            rows = rng.standard_normal((m, dim)).astype(np.float32)
            assert h.add(rows) == n + m
            shadow = np.vstack([shadow, rows])
            alive = np.concatenate([alive, np.ones(m, bool)])
        elif op == 0:                                 # update (unique idx)
            m = int(rng.integers(1, 7))
            idx = rng.choice(n, size=m, replace=False)
            rows = rng.standard_normal((m, dim)).astype(np.float32)
            h.update(idx, rows)
            shadow[idx] = rows
            alive[idx] = True
        elif op == 1 and alive.sum() > k + 2:         # delete
            m = int(rng.integers(1, 3))
            idx = rng.choice(np.nonzero(alive)[0], size=m, replace=False)
            h.delete(idx)
            alive[idx] = False
        elif op == 2:                                 # save -> mesh reload
            p = tmp_path / f"fzm_{storage}_{step}.npz"
            h.save(p)
            h = pmt.Corpus.load(p, mesh=mesh, capacity=400)
        # op 3/4: plain queries (checked below every step)

        q = rng.standard_normal((3, dim)).astype(np.float32)
        metric = metrics[step % 3]
        i, v = h.topk(q, k, metric)
        if storage == "f32":
            ref = shadow
        elif storage == "bf16":
            import ml_dtypes

            ref = shadow.astype(ml_dtypes.bfloat16).astype(np.float32)
        elif storage == "int8":
            from polars_matmul_tpu.api.search import _quantize_rows_np

            codes, scales = _quantize_rows_np(shadow)
            ref = codes.astype(np.float32) * scales[:, None]
        else:
            from polars_matmul_tpu.api.search import (
                _quantize_rows_int4_np, _unpack_int4_np)
            from polars_matmul_tpu.kernels.fused_topk import (
                feature_geometry)

            ck, dpp, _ = feature_geometry(dim)
            packed, scales = _quantize_rows_int4_np(shadow, ck, dpp)
            codes = _unpack_int4_np(packed, ck, dim)
            ref = codes.astype(np.float32) * scales[:, None]
        i0, smat = _oracle_topk(q, ref, k, alive, metric)
        mism = i != i0
        if mism.any():
            r, col = np.nonzero(mism)
            sa = smat[r, i[r, col]]
            sb = smat[r, i0[r, col]]
            assert np.allclose(sa, sb, rtol=1e-2, atol=1e-2), (
                f"step {step} op {op} metric {metric}: "
                f"non-tied index mismatch\n{i}\nvs\n{i0}"
            )
        assert alive[i.reshape(-1)].all() or not (~alive).any()
