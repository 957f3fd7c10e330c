"""Persistent XLA compilation cache enablement — CPU only.

Two hard-won facts about this environment (round 4):

1. The JAX_COMPILATION_CACHE_DIR env var is silently ignored (the axon
   TPU plugin initializes before jax reads it); enabling the cache
   requires jax.config.update AFTER import.
2. Under the axon remote-TPU backend the persistent cache is BROKEN for
   large programs: cached executables (both the write path and hits)
   come back invalid and every execution throws
   `INVALID_ARGUMENT: TPU backend error` with no detail.  Small
   programs (a 448x256 Cornell frame) survive; the 1080p frame and
   scan-chain programs do not.  The symptom is maddening: the same
   source compiles-and-runs fine cold, then "fails" forever once an
   entry exists.

So: enable the cache only when the axon backend is NOT registered
(plain CPU runs, real local TPU elsewhere).  TR_COMPILE_CACHE=1 forces
it on anyway (to re-test after an axon upgrade); TR_COMPILE_CACHE=0
forces it off.
"""

import os


def _axon_registered() -> bool:
    try:
        from jax._src import xla_bridge
        return 'axon' in xla_bridge.backends()
    except Exception:       # noqa: BLE001 — conservative: assume axon
        return True


def enable_compile_cache(path: str | None = None) -> str | None:
    import jax
    force = os.environ.get("TR_COMPILE_CACHE")
    if force == "0":
        return None
    if force != "1" and _axon_registered():
        return None
    if path is None:
        path = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(__file__), "..", "..",
                         ".jax_cache"))
    path = os.path.abspath(path)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
