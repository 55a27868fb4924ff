"""Shared JAX runtime configuration.

Enables the persistent compilation cache so the first-compile cost of the
train step / cache kernels is paid once per machine, not once per process —
essential when compiles run remotely over a slow link.
"""

from __future__ import annotations

import os


def setup(platform: str = "", cache_dir: str = "/root/.jax_compile_cache") -> None:
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    n_cpu = os.environ.get("COALA_CPU_DEVICES")
    if platform == "cpu" and n_cpu:
        jax.config.update("jax_num_cpu_devices", int(n_cpu))
    if os.environ.get("COALA_NO_COMPILE_CACHE"):
        return
    if not platform and "axon" in os.environ.get("JAX_PLATFORMS", ""):
        # Tunneled axon backend: persistent-cache writes serialize the
        # executable over the tunnel and inflate a 31s compile to ~380s
        # (measured 2026-08-17). Cold compiles are an order of magnitude
        # cheaper than cached ones there — skip the cache entirely.
        return
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run without the cache
