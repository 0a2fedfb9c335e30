"""JAX configuration: persistent compilation cache.

The big-int kernels produce large HLO graphs; caching compiled executables
across processes turns minute-scale first compiles into millisecond loads.
"""

import os

import jax

_CONFIGURED = False


def configure():
    global _CONFIGURED
    if _CONFIGURED:
        return
    cache_dir = os.environ.get(
        "GOETHKZG_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "goethkzg_tpu_jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is best-effort
    _CONFIGURED = True


configure()
