# Convenience targets for the TPU-native latent-fingerprinting framework.

PY ?= python

.PHONY: all native test test-fast bench dryrun clean

all: native

native:
	$(MAKE) -C native

test: native
	$(PY) -m pytest tests/ -q

test-fast: native
	$(PY) -m pytest tests/ -q -x -k "not e2e and not sharding and not cli"

bench:
	$(PY) bench.py

dryrun:
	JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  $(PY) -c "import jax; jax.config.update('jax_platforms','cpu'); import __graft_entry__ as g; g.dryrun_multichip(8)"

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
