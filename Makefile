# Developer entry points (reference has Makefile doc targets; ours covers the
# native core, tests, benches, and the 2-process integration run).

.PHONY: all native test test-kernels integration bench clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -x -q

test-fast: native
	python -m pytest tests/test_keccak.py tests/test_field.py tests/test_curve.py \
	  tests/test_generators.py tests/test_transcript.py tests/test_inner_product.py \
	  tests/test_r1cs.py tests/test_range_proof.py tests/test_mpc.py \
	  tests/test_msm_algorithm.py -q

integration: native
	bash integration/run_integration.sh

bench: native
	python bench.py

bench-suite: native
	python benches/run_benches.py
	python benches/check_artifacts.py

# Regenerate every derived benchmark artifact, then validate (fails on
# impossible values: negative kernel times, >100% efficiency).  The chip
# profile phases only run when the TPU tunnel is healthy; otherwise the
# committed kernel_profile.json is validated as-is.
artifacts: native
	python benches/run_benches.py
	-bash benches/tpu_capture.sh
	python benches/scaling_bench.py
	python benches/check_artifacts.py

clean:
	$(MAKE) -C native clean
	rm -rf .jax_cache .pytest_cache
