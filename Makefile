# Development targets (reference: Makefile with test/docker targets).

.PHONY: test test-slow lint bench examples notebooks docs clean

test:
	bash scripts/test_code.sh

# Opt-in slow proof gates: the 1000^2 pendulum bit-equality run against
# the float64 NumPy oracle (~10 min) and the 20-seed extended-precision
# soak. The scheduled CI job (slow-gates in .github/workflows/ci.yml)
# runs this weekly; a pass stamps date + durations into docs/index.md.
test-slow:
	@t0=$$(date +%s); \
	RUN_SLOW=1 python -m pytest tests/test_verification_oracle.py \
	    -q -k full_scale || exit 1; \
	t1=$$(date +%s); \
	RUN_SLOW=1 python -m pytest tests_f32/test_extended_soak.py -q \
	    || exit 1; \
	t2=$$(date +%s); \
	python scripts/record_slow_gate.py $$((t1-t0)) $$((t2-t1))

lint:
	python -m compileall -q safe_learning_tpu tests examples

# Static HTML docs (reference parity: the Sphinx autosummary build).
# Renders docs/*.md + README + guides and generates the API reference
# from the live package into docs/_build/.
docs:
	python scripts/build_docs.py

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
