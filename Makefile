# polars-matmul-tpu build/test/bench entry points
.PHONY: native test test-fast bench bench-gate clean

# Pinned TPU perf gates (v5e measurements + ~40% regression headroom;
# the gates only bite when the backend is a real TPU).
# Round-4 measured bands: k=10 gpop 0.125-0.136 ms, k=100 gstack+approx
# finish 0.268-0.275 (k=512 big-k runs 0.55, ungated).
# Update when bench.py's device_kernel_ms / device_kernel_k100_ms improve.
GATE_K10_MS ?= 0.20
GATE_K100_MS ?= 0.40

native: polars_matmul_tpu/interop/_pmm_native.so

# keep flags in sync with interop/native.py::_build (-fno-math-errno only
# drops errno bookkeeping; it lets gcc vectorize nearbyintf into roundps)
polars_matmul_tpu/interop/_pmm_native.so: native/pmm_native.cpp
	g++ -O3 -march=native -fno-math-errno -shared -fPIC -std=c++17 -o $@ $<

test: native
	python -m pytest tests/ -x -q

bench: native
	python bench.py

# Regression guard for CI-on-TPU: fails (exit 2) when the device kernel
# time exceeds the pinned thresholds at k=10 or k=100.
bench-gate: native
	python bench.py --gate $(GATE_K10_MS) --gate-k100 $(GATE_K100_MS)

clean:
	rm -f polars_matmul_tpu/interop/_pmm_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
