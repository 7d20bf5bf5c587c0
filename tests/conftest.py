"""Test harness: force CPU with an 8-device virtual mesh.

Unit tests must be fast, local, and fp32-exact; multi-chip sharding tests
run on the virtual host-platform mesh.  Real-TPU benchmarks live in
bench.py, not the test suite.  ``jax.config.update`` is used (not just the
env var) because the environment's sitecustomize may import jax and pin
``JAX_PLATFORMS=axon`` before pytest starts.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
