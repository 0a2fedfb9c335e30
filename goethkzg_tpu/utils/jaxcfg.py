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
    # Repo-local by default (not $HOME): every process that imports the
    # package — test runners, the bench harness, the multichip dryrun —
    # shares one cache keyed by the install location, so compiles warmed
    # in one process are millisecond loads in the next even when $HOME
    # differs between harnesses.
    default_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "data", "cache", "jax")
    cache_dir = os.environ.get("GOETHKZG_JAX_CACHE", default_dir)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is best-effort
    _CONFIGURED = True


configure()
