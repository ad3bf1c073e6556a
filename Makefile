# fgnn_tpu development targets.
#
# The session env pins JAX at a remote TPU tunnel that costs ~2min per
# interpreter start; CPU targets bypass it (see .claude/skills/verify).

CPU_ENV := env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu
MESH_ENV := $(CPU_ENV) XLA_FLAGS=--xla_force_host_platform_device_count=8

.PHONY: test test-fast bench sweep ldpc-train ldpc-eval lint

test:
	$(CPU_ENV) python -m pytest tests/ -x -q

test-fast:
	$(CPU_ENV) python -m pytest tests/ -x -q -m "not slow" \
		--ignore=tests/test_train_smoke.py

bench:
	python bench.py

sweep:
	python benchmarks/sweep.py

ldpc-train:
	python -m fgnn_tpu.train.ldpc --train --work-dir runs_tpu

ldpc-eval:
	python -m fgnn_tpu.train.ldpc --model-path $(CKPT) \
		--test-path dataset/ldpc_valid.npz --batch-size 100

dryrun:
	$(MESH_ENV) python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
