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
    flags += " --xla_force_host_platform_device_count=8"
# XLA:CPU's new fusion emitters have pathological (exponential) compile times
# on the deep u32 dependency chains of hash compressions and limb arithmetic;
# the legacy emitters compile the same graphs in seconds.
if "xla_cpu_use_fusion_emitters" not in flags:
    flags += " --xla_cpu_use_fusion_emitters=false"
# Tests are compile-bound (2-core CI box), not run-bound: backend opt level 0
# cuts prover-program compiles ~30% and cannot change results (all math here
# is exact integer ops).
if "xla_backend_optimization_level" not in flags:
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags.strip()

import sys

import jax

jax.config.update("jax_platforms", "cpu")
# 8 virtual CPU devices for sharding tests.  The XLA_FLAGS spelling
# (--xla_force_host_platform_device_count) stopped working in current JAX;
# jax_num_cpu_devices is the supported knob.
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass
# Persistent compilation cache: XLA:CPU compiles of wide-field kernels are the
# dominant test cost; cache them across runs.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("GENSTARK_TEST_CACHE_DIR",
                                 "/tmp/genstark_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
