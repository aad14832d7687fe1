"""Test env: hermetic CPU JAX with 8 virtual devices for sharding tests.

NOTE: this machine's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (the real-TPU tunnel), so setting the env var here is
too late — ``jax.config.update`` before first backend use is what works
(SURVEY.md s4 item 4: tests must be CPU-hermetic; the TPU is for bench.py).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
