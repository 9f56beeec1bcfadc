"""Test configuration: force the CPU backend with 8 virtual devices so tests
are fast and multi-chip sharding tests run anywhere (the driver benches on the
real TPU separately via bench.py, which keeps the default platform).

Note: the environment pins JAX_PLATFORMS=axon and a sitecustomize module may
import jax before pytest starts, so we both override the env var and update
the live jax config."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys

if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")
