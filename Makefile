# Convenience targets; the package itself needs no build step (native
# helpers compile on demand into ~/.cache/porechop_tpu/native).

.PHONY: all native test bench clean

all: native

native:
	python -c "from porechop_tpu import native; assert native.traceback_lib() is not None, 'g++ build failed'; print('native library ready')"

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -rf ~/.cache/porechop_tpu/native
