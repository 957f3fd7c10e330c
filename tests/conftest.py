"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's WARP-software-adapter smoke path (SURVEY.md §4):
tests never need real TPU hardware; sharding tests use the forced host
device count.  The environment's 'axon' TPU plugin force-appends itself to
jax_platforms regardless of JAX_PLATFORMS, so we override the config after
importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    The full suite runs hundreds of distinct jits in one process; XLA:CPU
    has segfaulted (flakily) deep into the suite while individual modules
    pass in isolation.  Bounding the live-executable set keeps the suite
    within what single-module runs exercise."""
    yield
    jax.clear_caches()
