import time
import numpy as np
import polars_matmul_tpu as pmt

M, N, D = 256, 2_000_000, 768
rng = np.random.default_rng(0)
q = rng.standard_normal((M, D)).astype(np.float32)
print("genning corpus...", flush=True)
c = rng.standard_normal((N, D)).astype(np.float32)
print("uploading + prepping...", flush=True)
t0 = time.perf_counter()
h = pmt.Corpus(c)
i, s = h.topk(q, 100, "cosine")
print("first call (upload+prep+query):", round(time.perf_counter()-t0, 1), "s", flush=True)
t0 = time.perf_counter()
i, s = h.topk(q, 100, "cosine")
print("steady-state call:", round((time.perf_counter()-t0)*1e3, 1), "ms", flush=True)
qq = q[:4].astype(np.float64); cc = c.astype(np.float64)
sm = (qq/np.linalg.norm(qq,axis=1,keepdims=True)) @ (cc/np.linalg.norm(cc,axis=1,keepdims=True)).T
print("top1 idx match:", np.array_equal(i[:4,0], np.argmax(sm,axis=1).astype(np.uint32)), flush=True)
