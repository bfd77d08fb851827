# Convenience targets for path_trace_golang_tpu.

.PHONY: all native test bench examples clean

all: native

native:
	$(MAKE) -C csrc

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

examples:
	python examples/render_examples.py

clean:
	$(MAKE) -C csrc clean
	rm -rf .jax_cache
