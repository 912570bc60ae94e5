"""Test configuration: run everything on a virtual 8-device CPU platform so
multi-chip sharding tests work without TPU hardware (SURVEY.md §4).

Note: the environment's sitecustomize imports jax and pins JAX_PLATFORMS=axon
(the TPU tunnel) at interpreter start, so env-var edits here are too late —
the platform must be forced through jax.config before any backend
initializes."""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()

import jax  # noqa: E402

# RUN_TPU_TESTS=1 runs the hardware test modules (tests/test_flash_tpu.py)
# against the real TPU instead of the virtual CPU mesh.
if os.environ.get("RUN_TPU_TESTS", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# This JAX build defaults matmul operand precision to bf16 (TPU-style) even on
# CPU; tests validate numerics against float64 references, so pin f32.
jax.config.update("jax_default_matmul_precision", "float32")

# persistent compilation cache across test runs
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
except Exception:
    pass
