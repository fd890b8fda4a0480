"""Test configuration: force CPU with 8 virtual devices and float64.

Multi-chip sharding is validated on a virtual CPU mesh
(``xla_force_host_platform_device_count``) — the TPU-native analogue of
testing multi-node behaviour without a cluster.  Float64 is enabled so golden
numerics tests can match the NumPy oracle at tight tolerances.

NOTE: this environment's sitecustomize pre-imports jax and registers the
``axon`` TPU plugin in every process, so ``JAX_PLATFORMS`` env tweaks are too
late — but backends initialise lazily, so flipping the *config flag* before
first use reliably selects CPU.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
