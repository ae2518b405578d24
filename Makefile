# Test/bench entry points.
#
# Tests must NOT claim the (single-claimant) tunneled TPU: clear
# PALLAS_AXON_POOL_IPS and force the CPU backend; conftest.py then builds
# the 8-device virtual mesh. bench.py runs on the real chip — run it alone.

PY ?= python

# -n auto: pytest-xdist fans tests over all CPUs (the persistent compile
# cache in conftest.py is process-safe, so workers share warm compiles);
# on a 1-vCPU box auto degrades to a single worker.
test:
	env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu $(PY) -m pytest tests/ -q -n auto

test-fast:
	env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu $(PY) -m pytest tests/ -q \
		--ignore=tests/test_mtov_train.py --ignore=tests/test_mtov_parity.py

bench:
	$(PY) bench.py

graft-check:
	env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
		XLA_FLAGS=--xla_force_host_platform_device_count=8 \
		$(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

.PHONY: test test-fast bench graft-check
