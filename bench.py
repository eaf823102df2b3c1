"""Canonical benchmark: fused top-k on the reference's headline workload.

Workload (reference README.md:162, BASELINE.md): 1000 queries x 10,000 corpus,
256 dims, f32, cosine, k=10.  Reference: ~45 ms end-to-end => ~22,222
queries/s.  Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measurement model: production serving with a device-resident corpus (the
Corpus handle is the intended usage; the reference re-marshals the corpus
every call).  The headline is steady-state DEVICE throughput: the rate the
chip sustains on back-to-back fused-kernel invocations (dependent in-jit
chain, RPC floor cancelled by chain-length differencing).  That is what a
co-located serving host gets, since the 1 MB/request query upload rides
PCIe/ICI and overlaps with compute.  End-to-end numbers through THIS
environment's RPC tunnel (~30-70 ms/call, strictly serialized — pipelined
requests do not overlap) are reported alongside: serial_latency_ms for one
request, tunnel_e2e_qps for the batch-accumulation serving mode (BATCH
stacked requests amortize the RPC floor over one upload/kernel/fetch).

Tunnel caveats baked into the methodology (this TPU sits behind an RPC
tunnel): (a) jax.block_until_ready does NOT wait for device completion here,
so every timed region ends in a host readback of real result bytes; (b) the
tunnel caches identical (executable, args) executions, so every request
carries unique query data; (c) per-RPC latency is ~30-70 ms and noisy, so
the device-only kernel time is recovered by differencing two dependent
in-jit chain lengths, which cancels the RPC floor exactly.

Self-verifies indices/scores against the NumPy oracle before timing
(like reference examples/benchmark_topk.py:122-138).
"""

import json
import os
import sys
import time

import numpy as np

# `python bench.py --gate MS` exits non-zero if device_kernel_ms exceeds MS
# (regression guard for future rounds; the driver's normal run passes no args).

N_QUERIES, N_CORPUS, DIM, K = 1000, 10_000, 256, 10
BATCH = 16  # stacked 1000-query requests per call for tunnel e2e throughput
BASELINE_S = 0.045  # reference fused topk, README.md:166
BASELINE_QPS = N_QUERIES / BASELINE_S


def _load_floors(device_kind: str):
    """Measured per-k selection floors from tools/floors.json (written by
    tools/exp_floor.py — VERDICT r04 item 5: the floor constants carry
    their provenance instead of living here as hardcoded numbers).
    Returns None when absent or measured on a different device kind, so a
    stale artifact silently omits the fractions rather than lying."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "floors.json")
    try:
        with open(path) as f:
            floors = json.load(f)
    except (OSError, ValueError):
        return None
    if floors.get("device_kind") != device_kind:
        return None
    return floors


def numpy_oracle(q, c, k):
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    cn = c / np.linalg.norm(c, axis=1, keepdims=True)
    s = qn.astype(np.float64) @ cn.astype(np.float64).T
    idx = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return idx, np.take_along_axis(s, idx, 1)


def best_ms(fn, iters=7):
    fn()  # warmup / compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def _preflight(timeout_s: float = 240.0):
    """Bounded backend-liveness probe in a subprocess.

    Backend init has no timeout of its own: when the TPU RPC tunnel is
    down, ``jax.devices()`` hangs forever, which would hang the whole
    bench run.  Probing in a killable subprocess converts that into a
    clean failure line.  Returns the backend name, or None if the
    backend never came up.
    """
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print(jax.default_backend())"],
            capture_output=True, text=True, timeout=timeout_s)
        if r.returncode == 0 and r.stdout.strip():
            return r.stdout.strip().splitlines()[-1]
    except subprocess.TimeoutExpired:
        pass
    return None


def main():
    if _preflight() is None:
        print(json.dumps({
            "metric": "topk_queries_per_sec",
            "value": 0.0,
            "unit": "queries/s",
            "vs_baseline": 0.0,
            "error": "device backend unavailable (init hung/failed)",
        }))
        sys.exit(1)

    import jax
    import jax.numpy as jnp

    import polars_matmul_tpu  # noqa: F401  (x64 setup)
    from polars_matmul_tpu.kernels.fused_topk import fused_topk
    from polars_matmul_tpu.utils.profiling import roofline

    rng = np.random.default_rng(42)
    q = rng.standard_normal((N_QUERIES, DIM)).astype(np.float32)
    c = rng.standard_normal((N_CORPUS, DIM)).astype(np.float32)

    from polars_matmul_tpu.api.search import _pack_pair, _unpack_pair

    backend = jax.default_backend()
    is_tpu = backend == "tpu"
    # Off-TPU (CI smoke) the Pallas kernel would run in interpret mode at
    # ~7 s/call; use the XLA product path and short chains there instead.
    from polars_matmul_tpu.config import SearchConfig, default_config

    cfg = default_config() if is_tpu else SearchConfig(use_pallas=False)
    cj = jnp.asarray(c)
    jax.block_until_ready(cj)

    @jax.jit
    def step_packed(qq):
        v, i = fused_topk(qq, cj, K, "cosine", config=cfg)
        return _pack_pair(v, i)

    step = jax.jit(lambda qq: fused_topk(qq, cj, K, "cosine", config=cfg))

    # ---- correctness gate vs NumPy oracle --------------------------------
    vals, idx = step(jnp.asarray(q))
    scores = np.asarray(vals).astype(np.float64)
    idx = np.asarray(idx)
    ref_idx, ref_scores = numpy_oracle(q, c, K)
    score_ok = np.allclose(scores, ref_scores, rtol=1e-4, atol=1e-5)
    mism = idx != ref_idx  # index diffs allowed only on tied scores
    idx_ok = bool(
        np.all(
            np.abs(scores[mism] - ref_scores[mism])
            <= 1e-5 + 1e-4 * np.abs(ref_scores[mism])
        )
    )
    if not (score_ok and idx_ok):
        print(json.dumps({
            "metric": "topk_queries_per_sec",
            "value": 0.0,
            "unit": "queries/s",
            "vs_baseline": 0.0,
            "error": "correctness check failed",
        }))
        sys.exit(1)

    # Unique query batches: each request perturbs a disjoint region so the
    # tunnel's (executable, args) result cache can never serve a repeat.
    _serial = [0]

    def fresh_queries():
        _serial[0] += 1
        qq = q.copy()
        qq[_serial[0] % N_QUERIES, 0] += 1e-3 * _serial[0]
        return qq

    # ---- serial latency: one 1000-query request per call -------------------
    # One packed device->host transfer (extra fetches cost a round trip each).
    def serial_call():
        _unpack_pair(np.asarray(step_packed(jnp.asarray(fresh_queries()))), K)

    # ---- RPC floor: an (almost) empty dispatch through the same tunnel -----
    # Same call anatomy as serial_call (host->device upload of fresh bytes,
    # one jitted dispatch, one device->host readback) with ~zero device
    # compute and ~zero payload, so serial_ms - rpc_floor_ms isolates the
    # work this framework actually adds per request (VERDICT r01 item 4:
    # the tunnel-overhead claim must be measured, not asserted).
    tiny = np.zeros((1, 1), np.float32)

    @jax.jit
    def nop(x):
        return x + 1.0

    def floor_call():
        t = tiny + _serial[0]
        _serial[0] += 1
        np.asarray(nop(jnp.asarray(t)))

    # Serial and floor are measured INTERLEAVED and the net is the
    # median of per-round differences: the tunnel's baseline latency
    # drifts by tens of ms across minutes (r05 observed the same bench
    # report 26.6 and then 50.9 net an hour apart), and differencing two
    # minima taken at different times compounds that drift into the one
    # number the gate reads.  Pairing each serial sample with an
    # adjacent floor sample cancels the common tunnel term.
    serial_call()   # warmup / compile
    floor_call()
    _serial_ts, _floor_ts = [], []
    for _ in range(9):
        t0 = time.perf_counter()
        serial_call()
        _serial_ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        floor_call()
        _floor_ts.append(time.perf_counter() - t0)
    serial_ms = min(_serial_ts) * 1e3
    rpc_floor_ms = min(_floor_ts) * 1e3
    _diffs = sorted(max(s - f, 0.0) for s, f in zip(_serial_ts, _floor_ts))
    serial_net_ms = _diffs[len(_diffs) // 2] * 1e3

    # ---- serial phase attribution (VERDICT r04 item 3) ---------------------
    # serial_ms = RPC floor + query upload + dispatch + kernel + result
    # readback + host-side packing.  Each phase is probed with the same
    # call anatomy as serial_call and reported net of the floor, so the
    # drift (25.4 -> 34.3 ms across r2 -> r4) has an owner.
    #
    # upload: the full 1 MB query payload, a trivial kernel, a 4-byte
    # readback — floor anatomy with the serial call's host->device bytes.
    @jax.jit
    def touch(x):
        return x[:1, :1] + 1.0

    def upload_call():
        np.asarray(touch(jnp.asarray(fresh_queries())))

    upload_ms = max(best_ms(upload_call) - rpc_floor_ms, 0.0)

    # readback: the packed (m, 2k) result transfer.  jax Arrays memoize
    # np.asarray after the first fetch, so each buffer is fetched exactly
    # once: drain the stream via the LAST result, then time first-touch
    # fetches of the completed earlier ones (pure transfer).
    rs = [step_packed(jnp.asarray(fresh_queries())) for _ in range(8)]
    np.asarray(rs[-1])  # stream is in-order: this drains all 8
    fetch_ts = []
    for r in rs[:-1]:
        t0 = time.perf_counter()
        np.asarray(r)
        fetch_ts.append(time.perf_counter() - t0)
    readback_ms = max(min(fetch_ts) * 1e3 - rpc_floor_ms, 0.0)

    # host: the python/numpy work inside the timed region (query-batch
    # build + result unpack), no device involved.
    t0 = time.perf_counter()
    for _ in range(8):
        fresh_queries()
    host_ms = (time.perf_counter() - t0) / 8 * 1e3
    sample = np.asarray(rs[0])
    t0 = time.perf_counter()
    for _ in range(8):
        _unpack_pair(sample, K)
    host_ms += (time.perf_counter() - t0) / 8 * 1e3

    # ---- half-precision query upload (serving tier, TPU only) --------------
    # Corpus.topk documents f16/bf16 query ingestion (upcast on device,
    # kernels/fused_topk.py::fused_topk_prepared): the wire payload
    # halves.  Scores move by the bf16 rounding of the QUERIES only
    # (~2^-8 relative) — a documented serving trade, reported as its own
    # field, never as the primary serial number.
    serial_bf16_ms = None
    if is_tpu:
        import ml_dtypes

        from polars_matmul_tpu.kernels.fused_topk import (
            corpus_tile_rows, fused_topk_prepared, prepare_corpus)

        tn16 = corpus_tile_rows(DIM, cfg, K)
        cp16, cbp16 = jax.block_until_ready(
            prepare_corpus(cj, "cosine", tn=tn16, precision=cfg.precision))

        @jax.jit
        def step_packed16(qq, cp_, cb_):
            v, i = fused_topk_prepared(qq, cp_, cb_, K, "cosine",
                                       tn=tn16, config=cfg)
            return _pack_pair(v, i)

        def serial16_call():
            q16 = fresh_queries().astype(ml_dtypes.bfloat16)
            _unpack_pair(
                np.asarray(step_packed16(jnp.asarray(q16), cp16, cbp16)),
                K)

        serial_bf16_ms = best_ms(serial16_call)

    # ---- tunnel end-to-end throughput: one STACKED batch per call ----------
    # The tunnel serializes RPCs (pipelined requests do not overlap), so the
    # serving-throughput mode here is batch accumulation: BATCH concurrent
    # 1000-query requests ride one upload + one kernel + one fetch.
    batch = BATCH if is_tpu else 2

    def stacked():
        qs = np.concatenate([fresh_queries() for _ in range(batch)], axis=0)
        _unpack_pair(np.asarray(step_packed(jnp.asarray(qs))), K)

    stack_ms = best_ms(stacked)
    tunnel_qps = N_QUERIES * batch / (stack_ms / 1e3)

    # ---- device-only kernel time -------------------------------------------
    # Chain-differencing timer shared with pmt.autotune (see its module
    # docstring for why this is the only honest timing on this tunnel).
    from polars_matmul_tpu.utils.autotune import device_step_seconds

    def kernel_step(qq):
        v, _ = fused_topk(qq, cj, K, "cosine", config=cfg)
        return jnp.max(v, axis=1, keepdims=True)

    qj = jnp.asarray(q)
    jax.block_until_ready(qj)
    c_lo, c_hi = (8, 200) if is_tpu else (1, 4)
    kernel_ms = device_step_seconds(
        kernel_step, qj, chain_lo=c_lo, chain_hi=c_hi, iters=7
    ) * 1e3

    # ---- secondary: k=100 on the same corpus (BASELINE pod-config k) -------
    def kernel_step_k100(qq):
        v, _ = fused_topk(qq, cj, 100, "cosine", config=cfg)
        return jnp.max(v, axis=1, keepdims=True)

    k100_ms = device_step_seconds(
        kernel_step_k100, qj, chain_lo=c_lo, chain_hi=c_hi, iters=5
    ) * 1e3

    # ---- big-k (round 4): 128 < k <= 1024 stays fused ------------------
    def kernel_step_k512(qq):
        v, _ = fused_topk(qq, cj, 512, "cosine", config=cfg)
        return jnp.max(v, axis=1, keepdims=True)

    k512_ms = device_step_seconds(
        kernel_step_k512, qj, chain_lo=c_lo, chain_hi=c_hi, iters=5
    ) * 1e3

    # ---- tertiary: exact-f32 precision tier (VERDICT r02 weak #6 asked
    # that "highest" be exercised by the bench, not just by tests) --------
    cfg_hi = cfg.with_updates(precision="highest")

    def kernel_step_highest(qq):
        v, _ = fused_topk(qq, cj, K, "cosine", config=cfg_hi)
        return jnp.max(v, axis=1, keepdims=True)

    highest_ms = device_step_seconds(
        kernel_step_highest, qj, chain_lo=c_lo, chain_hi=c_hi, iters=5
    ) * 1e3

    flops = 2.0 * N_QUERIES * N_CORPUS * DIM
    roof = roofline(flops, kernel_ms / 1e3, "float32")
    qps = N_QUERIES / (kernel_ms / 1e3)

    out = {
        "metric": "topk_queries_per_sec",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
        "workload": f"{N_QUERIES}x{N_CORPUS}x{DIM}d f32 cosine k={K}",
        "mode": "device steady-state (back-to-back fused kernels, corpus "
                "resident); see module docstring for the tunnel caveat",
        "serial_latency_ms": round(serial_ms, 2),
        # strict single-request comparison vs the reference's 45 ms call
        "vs_baseline_serial": round(
            (N_QUERIES / (serial_ms / 1e3)) / BASELINE_QPS, 3),
        # measured per-request overhead of an (almost) empty dispatch
        # through the same tunnel; serial minus floor is the work this
        # framework adds per request (upload + kernel + packed fetch)
        "rpc_floor_ms": round(rpc_floor_ms, 2),
        # median of interleaved per-round (serial - floor) pairs — the
        # drift-cancelled framework cost per request
        "serial_net_of_rpc_ms": round(serial_net_ms, 2),
        "vs_baseline_serial_net": round(
            (N_QUERIES / (max(serial_net_ms, 1e-6) / 1e3))
            / BASELINE_QPS, 3),
        # net-of-floor phase breakdown of the serial call (VERDICT r04
        # item 3): upload = the 1 MB query payload's transfer, readback =
        # the packed result's, host = python/numpy batch build + unpack,
        # dispatch_residual = what's left after those and the kernel —
        # per-call framework/tunnel overhead not explained by payload.
        "serial_upload_ms": round(upload_ms, 2),
        "serial_readback_ms": round(readback_ms, 2),
        "serial_host_ms": round(host_ms, 2),
        "serial_dispatch_residual_ms": round(
            max(serial_net_ms - upload_ms - readback_ms
                - host_ms - kernel_ms, 0.0), 2),
        # batch-accumulation serving (BATCH stacked requests per call)
        # vs the same single-call baseline — amortizes the RPC floor,
        # so it is a throughput comparison, not a latency one
        "tunnel_e2e_qps": round(tunnel_qps, 1),
        "vs_baseline_e2e_batched": round(tunnel_qps / BASELINE_QPS, 3),
        "device_kernel_ms": round(kernel_ms, 3),
        "device_kernel_k100_ms": round(k100_ms, 3),
        "device_kernel_k512_ms": round(k512_ms, 3),
        "device_kernel_highest_ms": round(highest_ms, 3),
        "kernel_gflops": round(roof["achieved_gflops"], 1),
        "backend": backend,
    }
    if serial_bf16_ms is not None:
        out["serial_latency_bf16q_ms"] = round(serial_bf16_ms, 2)
        out["serial_bf16q_net_of_rpc_ms"] = round(
            max(serial_bf16_ms - rpc_floor_ms, 0.0), 2)
        out["vs_baseline_serial_bf16q_net"] = round(
            (N_QUERIES / (max(serial_bf16_ms - rpc_floor_ms, 1e-6) / 1e3))
            / BASELINE_QPS, 3)
    if "fraction_of_peak" in roof:
        # ONE denominator (VERDICT r04 weak #2): the fraction of the
        # 197 TF/s v5e bf16 MXU peak the kernel keeps busy, counting the
        # bf16x3 precision contract's real 3 passes — equivalently,
        # nominal f32 FLOPs over the 197/3 TF/s 3-pass ceiling
        # (utils/profiling.py's "float32" peak entry).  ARCHITECTURE
        # "Roofline accounting" uses the same arithmetic.
        out["mxu_active_fraction"] = round(roof["fraction_of_peak"], 4)
    if is_tpu:
        # Measured per-k selection floors (tools/exp_floor.py writes
        # tools/floors.json; see _load_floors): bf16x3 matmul + epilogue
        # + the structural minimum of packed exact selection — 1 stack
        # level for k <= 128, ceil(k/128) levels beyond (pigeonhole).
        # These fractions, not MXU MFU, are the honest headline for an
        # exact fused top-k — see ARCHITECTURE.md "Roofline accounting".
        floors = _load_floors(jax.devices()[0].device_kind)
        if floors:
            for kk, ms in ((10, kernel_ms), (100, k100_ms),
                           (512, k512_ms)):
                frac = floors[f"floor_k{kk}_ms"] / max(ms, 1e-9)
                key = ("fraction_of_selection_floor" if kk == K
                       else f"fraction_of_selection_floor_k{kk}")
                out[key] = round(frac, 4)
    print(json.dumps(out))

    # `--autotune`: run the sweep (persisted winner cache) and report the
    # winner next to the default-config number just printed.
    if "--autotune" in sys.argv and is_tpu:
        from polars_matmul_tpu.utils.autotune import autotune

        win = autotune(N_QUERIES, N_CORPUS, DIM, K, "cosine")

        def kernel_step_win(qq):
            v, _ = fused_topk(qq, cj, K, "cosine", config=win)
            return jnp.max(v, axis=1, keepdims=True)

        win_ms = device_step_seconds(
            kernel_step_win, qj, chain_lo=c_lo, chain_hi=c_hi, iters=5
        ) * 1e3
        base = {f: getattr(win, f) for f in
                ("block_q", "block_n", "selection", "precision", "prune")}
        print(json.dumps({"autotune_winner": base,
                          "winner_device_kernel_ms": round(win_ms, 3),
                          "default_device_kernel_ms": round(kernel_ms, 3)}),
              file=sys.stderr)

    # Regression gates (VERDICT r01 item 5, r04 item 6): `--gate MS` pins
    # the k=10 device kernel time; `--gate-k100`, `--gate-k512`, and
    # `--gate-highest` pin the other three measured tiers.  `make
    # bench-gate` runs all four with the pinned round numbers.
    failed = False
    for flag, name, measured in (
        ("--gate", "device_kernel_ms", kernel_ms),
        ("--gate-k100", "device_kernel_k100_ms", k100_ms),
        ("--gate-k512", "device_kernel_k512_ms", k512_ms),
        ("--gate-highest", "device_kernel_highest_ms", highest_ms),
    ):
        if flag in sys.argv:
            limit = float(sys.argv[sys.argv.index(flag) + 1])
            if backend == "tpu" and measured > limit:
                print(f"PERF GATE FAILED: {name} {measured:.3f} > {limit}",
                      file=sys.stderr)
                failed = True
    if failed:
        sys.exit(2)


if __name__ == "__main__":
    main()
