# Convenience targets (see docs/RUNBOOK.md for the full recipes)

# CPU test env: skip the per-process TPU-relay dial (see tests/README.md)
TEST_ENV := PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

.PHONY: test test-fast bench entry lint

test:
	$(TEST_ENV) python -m pytest tests/ -q

test-fast:
	$(TEST_ENV) python -m pytest tests/ -q -x \
		--deselect tests/test_trainer.py::test_multichip_ls_tp_matches_single_device \
		--deselect tests/test_trainer.py::test_multichip_dp_tp_matches_single_device \
		--deselect tests/test_ls_eend.py::test_remat_grads_identical

bench:
	python bench.py

entry:
	$(TEST_ENV) XLA_FLAGS=--xla_force_host_platform_device_count=8 \
		python __graft_entry__.py

lint:
	python -m py_compile $$(git ls-files '*.py')
