# Convenience targets (see docs/RUNBOOK.md for the full recipes)

# CPU test env: skip the per-process TPU-relay dial (see tests/README.md)
TEST_ENV := PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

.PHONY: test test-fast bench entry lint curriculum curriculum-ls

# progressive 1->4-speaker curriculum on synthetic mixtures, end to end
# (train -> init_ckpt chain -> ckpt averaging -> h5 -> collar DER);
# results land in $(CURR_WORK)/RESULTS.md
CURR_WORK ?= /tmp/curr_fs
curriculum:
	python tools/run_curriculum.py --model fs --work $(CURR_WORK) \
		--stages 1,2,3,4 --epochs 25

curriculum-ls:
	python tools/run_curriculum.py --model ls --work $(or $(CURR_WORK_LS),/tmp/curr_ls) \
		--stages 1,2,3,4 --epochs 25

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
