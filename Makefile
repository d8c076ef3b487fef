# Common workflows. TPU targets append to PYTHONPATH (never overwrite — the
# axon platform plugin lives on it).

PY ?= python

.PHONY: test test-fast bench dryrun mas profile clean

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -m "not slow"

bench:
	$(PY) bench.py

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
		$(PY) __graft_entry__.py

mas: jyutvoice_tpu/align/libmas.so

jyutvoice_tpu/align/libmas.so: jyutvoice_tpu/align/mas.cpp
	g++ -O3 -fopenmp -shared -fPIC $< -o $@

profile:
	PYTHONPATH=$(PWD):$$PYTHONPATH $(PY) scripts/profile_tpu.py

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; true
	rm -f jyutvoice_tpu/align/libmas.so
