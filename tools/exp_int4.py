"""int4 unpack-cost attribution + variants (VERDICT r04 item 2).

At dim 768 batch-8 the int4 tier measures 16.4 ms vs int8's 14.8 on the
10M north-star despite HALF the HBM bytes (floors 4.69 vs 9.38): the
per-element i32 nibble unpack outruns the bandwidth it saves.  This
experiment isolates the unpack on a 2M x 768 proxy (same per-byte work,
8x faster to build) and races repack/unpack variants:

  int8c     the int8 tier at the same tiling — the bar to beat.
  int4-i32  the shipped unpack: i8->i32 widen, mask/xor/sub per nibble
            (Mosaic has no i8 shifts, so everything runs in i32).
  int4-rint ARITHMETIC repack b = 16*hi + lo (lo, hi in [-7,7], so
            |lo/16| <= 0.4375 < 0.5): unpack in FLOAT — one convert,
            hi = rint(b/16) exact, lo = b - 16*hi — no masks, no shifts.
  int4-raw  packed bytes fed straight to the MXU as bf16 (WRONG results;
            the zero-unpack cost floor: what a free unpack would give).

Each variant: batch 8 and 256, k=100, chain-differenced device ms.

MEASURED (v5e, round 5) — batch-8: int8c 2.826, int4-i32 2.835,
int4-rint 3.247, int4-raw 2.278 (bytes floors 1.876 / 0.938); batch-256:
9.56 / 9.70 / 10.03 / 9.88.  The raw control IS the verdict: even a free
unpack buys only 1.24x over int8 at batch-8 — a ~1.34 ms non-bytes term
(tiny-m MXU passes + per-tile orchestration) caps the bytes tier, the
i32 unpack's 0.56 ms erases exactly the remaining headroom, and the
float repack pays more for the f32 convert + rint than the bit math it
removes.  At batch-256 raw TIES int8: compute-bound, bytes irrelevant.
int4 stays the capacity tier (ARCHITECTURE "north-star" section).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_int4.py
     [prep]  (prep: build/cache the host-side corpora only, no TPU)
"""
import functools
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import importlib

import polars_matmul_tpu  # noqa: F401

FT = importlib.import_module("polars_matmul_tpu.kernels.fused_topk")

N, DIM = 2_000_000, 768
_LANES = 128


def chain(step, q, extra=(), lo=2, hi=8, iters=3):
    def chained(n):
        @jax.jit
        def f(qq, t, *ex):
            qq = qq + t

            def body(i, qq):
                return qq + step(qq, *ex) * 1e-30

            return jax.lax.fori_loop(0, n, body, qq)[0, 0]

        return f

    f_lo, f_hi = chained(lo), chained(hi)
    tick = [0.0]

    def run(g):
        tick[0] += 1e-7
        t0 = time.time()
        float(np.asarray(g(q, jnp.float32(tick[0]), *extra)))
        return time.time() - t0

    run(f_lo), run(f_hi)
    a = min(run(f_lo) for _ in range(iters))
    b = min(run(f_hi) for _ in range(iters))
    return (b - a) / (hi - lo) * 1e3


def _kernel_mm(q_ref, c_ref, cb_ref, out_ref, st_ref, *, mode: str,
               tm: int, tn: int):
    """Matmul + epilogue + 1-level selection floor, corpus decoded per
    ``mode``.  Selection is the same for all modes so deltas isolate the
    decode."""
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    dsplit = q_ref.shape[1] // 2
    qh, ql = q_ref[:, :dsplit], q_ref[:, dsplit:]
    if mode == "int8":
        ch = c_ref[:].astype(jnp.bfloat16)
    elif mode == "i32":
        lo, hi = FT._unpack_int4_i32(c_ref[:].astype(jnp.int32))
        ch = jnp.concatenate([lo, hi], axis=1).astype(jnp.bfloat16)
    elif mode == "rint":
        b = c_ref[:].astype(jnp.float32)
        t = b * 0.0625
        hi = jnp.rint(t)
        lo = b - 16.0 * hi
        ch = jnp.concatenate([lo, hi], axis=1).astype(jnp.bfloat16)
    elif mode == "raw":
        # wrong results on purpose: zero-unpack cost floor.  Feed the
        # packed bytes twice so the matmul shape matches the others.
        cb16 = c_ref[:].astype(jnp.bfloat16)
        ch = jnp.concatenate([cb16, cb16], axis=1)
    p = jax.lax.Precision.DEFAULT
    d = (jax.lax.dot_general(qh, ch, (((1,), (1,)), ((), ())), precision=p,
                             preferred_element_type=jnp.float32)
         + jax.lax.dot_general(ql, ch, (((1,), (1,)), ((), ())),
                               precision=p,
                               preferred_element_type=jnp.float32))
    s = d * cb_ref[0:1, :] + cb_ref[1:2, :]

    @pl.when(j == 0)
    def _():
        st_ref[0] = jnp.full((tm, _LANES), jnp.iinfo(jnp.int32).min,
                             jnp.int32)
    clean = jnp.int32(~127)
    u = FT._f32_to_u(jax.lax.bitcast_convert_type(s, jnp.int32))
    st0 = st_ref[0]
    for g in range(tn // _LANES):
        t2 = (u[:, g * _LANES:(g + 1) * _LANES] & clean) | jnp.int32(g)
        st0 = jnp.maximum(st0, t2)
    st_ref[0] = st0

    @pl.when(j == n_j - 1)
    def _():
        out_ref[:] = st_ref[0]


def measure(mode, qp, cp, cbp, tm, tn, dk_c):
    mp = qp.shape[0]
    np_ = cbp.shape[1]
    kern = functools.partial(_kernel_mm, mode=mode, tm=tm, tn=tn)
    call = pl.pallas_call(
        kern,
        grid=(mp // tm, np_ // tn),
        in_specs=[
            pl.BlockSpec((tm, 2 * DIM), lambda i, j: (i, 0)),
            pl.BlockSpec((tn, dk_c), lambda i, j: (j, 0)),
            pl.BlockSpec((2, tn), lambda i, j: (0, j)),
        ],
        out_specs=[pl.BlockSpec((tm, _LANES), lambda i, j: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((mp, _LANES), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((1, tm, _LANES), jnp.int32)],
    )

    def step(qq, cp_, cb_):
        with jax.enable_x64(False):
            (o,) = call(qq, cp_, cb_)
        return o[:, :1].astype(jnp.float32)

    return chain(step, qp, extra=(cp, cbp))


def _host_quantize_int8(c):
    amax = np.max(np.abs(c), axis=1, keepdims=True)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    return np.rint(c / scale).astype(np.int8), scale[:, 0]


def _host_quantize_int4(c, ck):
    amax = np.max(np.abs(c), axis=1, keepdims=True)
    scale = np.where(amax > 0, amax / 7.0, 1.0).astype(np.float32)
    codes = np.clip(np.rint(c / scale), -7, 7).astype(np.int32)
    n, dim = c.shape
    lo = codes[:, : dim // 2]
    hi = codes[:, dim // 2:]
    packed = ((lo & 0xF) | ((hi & 0xF) << 4)).astype(np.int8)
    return packed, scale[:, 0]


CACHE = "/tmp/exp_int4_cache.npz"


def _prep(np_pad):
    """Host-side corpus prep, CHUNKED (the unchunked first version blew
    the experiment's time budget on 6 GB float temporaries) and cached:
    int8 codes, nibble-packed int4 (shipped layout), arithmetic-repack
    int4 (16*hi + lo), plus the cosine bias rows for each."""
    cp8 = np.zeros((np_pad, DIM), np.int8)
    cp4 = np.zeros((np_pad, DIM // 2), np.int8)
    cpA = np.zeros((np_pad, DIM // 2), np.int8)
    ss8 = np.zeros(np_pad, np.float32)
    ss4 = np.zeros(np_pad, np.float32)
    for i in range(0, N, 250_000):
        r2 = np.random.default_rng(500 + i)
        c = r2.standard_normal((250_000, DIM)).astype(np.float32)
        codes8, _ = _host_quantize_int8(c)
        cp8[i:i + 250_000] = codes8
        ss8[i:i + 250_000] = np.einsum(
            "ij,ij->i", codes8.astype(np.float32),
            codes8.astype(np.float32))
        del codes8
        codes4, _ = _host_quantize_int4(c, FT.feature_chunk(DIM))
        del c
        cp4[i:i + 250_000] = codes4
        lo = ((codes4.astype(np.int16) & 0xF) ^ 8) - 8
        hi = (((codes4.astype(np.int16) >> 4) & 0xF) ^ 8) - 8
        del codes4
        ss4[i:i + 250_000] = np.einsum(
            "ij,ij->i", lo.astype(np.float32), lo.astype(np.float32)
        ) + np.einsum(
            "ij,ij->i", hi.astype(np.float32), hi.astype(np.float32))
        cpA[i:i + 250_000] = (16 * hi + lo).astype(np.int8)
        del lo, hi

    def host_cosine_bias(sumsq):
        cn = np.sqrt(sumsq[:N])
        cs = np.zeros(np_pad, np.float32)
        cs[:N] = np.where(cn > 0, 1.0 / cn, 0.0)
        cb = np.zeros(np_pad, np.float32)
        cb[N:] = -np.inf
        return np.ascontiguousarray(np.stack([cs, cb]))

    return cp8, host_cosine_bias(ss8), cp4, host_cosine_bias(ss4), cpA


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(21)

    # the tile height the PRODUCT kernel picks for this (dim, k): the
    # VMEM model shrinks block_n below the k>16 default 4096 at dim 768
    from polars_matmul_tpu.config import SearchConfig

    tn = FT.corpus_tile_rows(DIM, SearchConfig(precision="int8c",
                                               use_autotune_cache=False),
                             k=100)
    print(json.dumps({"tag": "tiling", "tn": tn}), flush=True)
    np_pad = ((N + tn - 1) // tn) * tn

    try:
        z = np.load(CACHE)
        cp8, cb8, cp4, cb4, cpA = (z["cp8"], z["cb8"], z["cp4"], z["cb4"],
                                   z["cpA"])
    except OSError:
        cp8, cb8, cp4, cb4, cpA = _prep(np_pad)
        np.savez(CACHE, cp8=cp8, cb8=cb8, cp4=cp4, cb4=cb4, cpA=cpA)
    print(json.dumps({"tag": "prep-done"}), flush=True)
    if len(sys.argv) > 1 and sys.argv[1] == "prep":
        return

    q = rng.standard_normal((256, DIM)).astype(np.float32)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)

    for b in (8, 256):
        qp = np.zeros((max(b, 8), DIM), np.float32)
        qp[:b] = qn[:b]
        qsplit = jax.block_until_ready(jnp.asarray(np.asarray(
            FT._split_hi_lo(jnp.asarray(qp)))))
        tm = min(128, qp.shape[0])
        for tag, mode, cp_np, cb_np, dk in (
            ("int8c", "int8", cp8, cb8, DIM),
            ("int4-i32", "i32", cp4, cb4, DIM // 2),
            ("int4-rint", "rint", cpA, cb4, DIM // 2),
            ("int4-raw", "raw", cp4, cb4, DIM // 2),
        ):
            cpj = jax.block_until_ready(jnp.asarray(cp_np))
            cbj = jax.block_until_ready(jnp.asarray(cb_np))
            ms = measure(mode, qsplit, cpj, cbj, tm, tn, dk)
            gb = cpj.size / 1e9
            floor = gb / 819.0 * 1e3
            print(json.dumps({
                "tag": f"{tag}-b{b}", "ms": round(ms, 3),
                "hbm_floor_ms": round(floor, 3),
                "fraction_of_floor": round(floor / ms, 3)}), flush=True)
            del cpj, cbj


if __name__ == "__main__":
    main()
