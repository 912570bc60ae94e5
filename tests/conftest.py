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
import pytest  # noqa: E402

# RUN_TPU_TESTS=1 runs the hardware test modules (tests/test_flash_tpu.py)
# against the real TPU instead of the virtual CPU mesh.
if os.environ.get("RUN_TPU_TESTS", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# This JAX build defaults matmul operand precision to bf16 (TPU-style) even on
# CPU; tests validate numerics against float64 references, so pin f32.
jax.config.update("jax_default_matmul_precision", "float32")

# persistent compilation cache across test runs. The cache key must include
# the HOST CPU's feature set: this VM's underlying machine changes between
# sessions, and XLA:CPU AOT entries compiled with e.g. +prefer-no-gather
# mis-execute on hosts without it (observed as a flaky numeric failure in
# test_bfloat16_compute_dtype_forward_and_grads with a cpu_aot_loader
# machine-feature mismatch warning).
try:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
        suffix = hashlib.sha1(flags.encode()).hexdigest()[:8]
    except OSError:
        suffix = "nohost"
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     f"/tmp/jaxcache-{suffix}"))
except Exception:
    pass


def pytest_collection_modifyitems(session, config, items):
    """Fail collection if a module defines the same test name twice: Python
    shadowing makes the first definition silently never run (this bit us —
    a broken test hid behind a later duplicate for a whole round)."""
    import ast
    import collections

    seen_files = set()
    errors = []
    for item in items:
        path = str(getattr(item, "fspath", ""))
        if not path or path in seen_files or not path.endswith(".py"):
            continue
        seen_files.add(path)
        with open(path) as f:
            tree = ast.parse(f.read(), filename=path)
        # Shadowing only happens WITHIN one scope — same-named tests in
        # different classes are legal pytest — so count per scope (module
        # top level, and each class body) instead of ast.walk over all.
        scopes = [("module", tree.body)] + [
            (node.name, node.body) for node in ast.walk(tree)
            if isinstance(node, ast.ClassDef)]
        for scope, body in scopes:
            counts = collections.Counter(
                node.name for node in body
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
                and node.name.startswith("test"))
            for name, n in counts.items():
                if n > 1:
                    errors.append(
                        f"{path}: '{name}' defined {n} times in {scope} "
                        f"(earlier definitions are shadowed)")
    if errors:
        raise pytest.UsageError("duplicate test names:\n  "
                                + "\n  ".join(errors))
