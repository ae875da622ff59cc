"""Opt-in persistent XLA compilation cache.

Hardware profiling scripts and the bench pay 20-40 s per program class on
every fresh process; the persistent cache turns that into a disk read.
Opt-in (scripts call :func:`enable` explicitly; BVC_COMPCACHE=0 disables)
so library users keep JAX's defaults.
"""

import os


def enable(path: str = "/root/.cache/bvc_jax_cache") -> bool:
    if os.environ.get("BVC_COMPCACHE", "1") == "0":
        return False
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:  # cache is a convenience, never a failure
        return False
