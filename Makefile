# Ops layer (reference Makefile parity, minus Docker — this framework runs
# directly on TPU VMs; the reference's CUDA container concerns don't apply).

PY ?= python
CONFIG ?= configs/train_default_sr.yml

.PHONY: test test-fast train predict bench sweep lint clean

# smoke-test the accelerator (reference `make test` prints GPU properties,
# Makefile:107-110)
test-devices:
	$(PY) -c "import jax; [print(d) for d in jax.devices()]"

# FULL lane (overrides pytest.ini's default "not slow" filter)
test:
	$(PY) -m pytest tests/ -x -q -m "slow or not slow"

# fast lane = the pytest.ini default (~7 min on this 1-core host)
test-fast:
	$(PY) -m pytest tests/ -x -q

train:
	$(PY) -m srtpu fit --config $(CONFIG) $(ARGS)

predict:
	$(PY) -m srtpu predict --checkpoint $(CKPT) $(ARGS)

bench:
	$(PY) bench.py

bench-kernels:
	$(PY) tools/bench_kernels.py

sweep:
	$(PY) tools/run_comparisons.py $(ARGS)

# dependency-free: syntax, unused imports, line length (reference
# .ruff.toml pins line-length only; ruff isn't in this image)
lint:
	$(PY) tools/lint.py

# real-dataset quality parity vs reference/literature (BASELINE.json north
# star); needs datasets/DIV2K + datasets/Set5 etc. on disk
parity:
	$(PY) tools/run_parity.py $(ARGS)

clean:
	rm -rf experiments __pycache__ srtpu/**/__pycache__ .pytest_cache
