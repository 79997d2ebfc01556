"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a host-platform mesh
(xla_force_host_platform_device_count), per the project's test strategy
(SURVEY.md section 4): real-TPU runs happen in bench.py, unit tests are
deterministic CPU.

The session environment pins the experimental 'axon' TPU platform via a
sitecustomize hook that registers the backend at interpreter start, so env
vars alone are not enough --- we also pin ``jax.config`` before any backend
is initialized.
"""

import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
