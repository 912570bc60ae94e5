"""Honor JAX platform requests made via environment variables.

Some launch environments pin a default platform at interpreter start (e.g. a
sitecustomize that registers a TPU plugin and sets the platform before user
code runs). A user asking for a virtual CPU mesh with
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=N``
would be silently overridden. Entry points call `honor_env_platform()` first
thing so the env request wins (it must run before any JAX backend
initializes).
"""

from __future__ import annotations

import os
import re


def honor_env_platform(min_devices: int = 0) -> None:
    """Re-pin jax.config to the platform requested via env vars, if any."""
    import jax

    env_plat = os.environ.get("JAX_PLATFORMS", "")
    flags = os.environ.get("XLA_FLAGS", "")
    m = re.search(r"xla_force_host_platform_device_count=(\d+)", flags)
    if not (env_plat.startswith("cpu") or m is not None):
        return
    try:
        jax.config.update("jax_platforms", "cpu")
        n_cpu = max(int(m.group(1)) if m else 0, min_devices, 1)
        jax.config.update("jax_num_cpu_devices", n_cpu)
    except Exception:
        pass  # backend already initialized; device checks will report it
