"""Persistent XLA compilation cache enablement.

The JAX_COMPILATION_CACHE_DIR environment variable is NOT honored in
this environment (the axon TPU plugin initializes before jax reads it),
so every tool funnels through this helper, which sets the config
explicitly AFTER jax import.  A warm .jax_cache turns the ~3-7 min
scan-chain compiles into second-scale loads — it is the difference
between the benchmark fitting the driver budget or not.
"""

import os


def enable_compile_cache(path: str | None = None) -> str:
    import jax
    if path is None:
        path = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(__file__), "..", "..",
                         ".jax_cache"))
    path = os.path.abspath(path)
    jax.config.update("jax_compilation_cache_dir", path)
    # chain compiles are huge; cache everything that took real time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
