# Development targets (reference: Makefile with test/docker targets).

.PHONY: test lint bench examples notebooks clean

test:
	bash scripts/test_code.sh

lint:
	python -m compileall -q safe_learning_tpu tests examples

bench:
	python bench.py

# Run every example end-to-end at quick (CPU) scale.
examples:
	@for f in examples/one_d_region_of_attraction_estimate.py \
	          examples/one_d_example.py \
	          examples/basic_dynamic_programming.py \
	          examples/adaptive_safety_verification.py \
	          examples/inverted_pendulum.py \
	          examples/lyapunov_function_learning.py \
	          examples/reinforcement_learning_pendulum.py \
	          examples/reinforcement_learning_cartpole.py; do \
	    echo "=== $$f ==="; python $$f || exit 1; \
	done

# Rebuild + re-execute the tutorial notebooks (CPU, quick sizes).
notebooks:
	python scripts/build_notebooks.py

clean:
	rm -rf .jax_cache __pycache__ */__pycache__ */*/__pycache__
