# polars-matmul-tpu build/test/bench entry points
.PHONY: native test test-fast bench clean

native: polars_matmul_tpu/interop/_pmm_native.so

# keep flags in sync with interop/native.py::_build (-fno-math-errno only
# drops errno bookkeeping; it lets gcc vectorize nearbyintf into roundps)
polars_matmul_tpu/interop/_pmm_native.so: native/pmm_native.cpp
	g++ -O3 -march=native -fno-math-errno -shared -fPIC -std=c++17 -o $@ $<

test: native
	python -m pytest tests/ -x -q

bench: native
	python bench.py

clean:
	rm -f polars_matmul_tpu/interop/_pmm_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
