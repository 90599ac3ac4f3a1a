"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
`--xla_force_host_platform_device_count` as the fake cluster (SURVEY.md §4).

The session environment pins JAX_PLATFORMS=axon (a remote TPU tunnel with
remote per-op compilation, registered eagerly by sitecustomize before pytest
starts), which makes eager-mode tests pathologically slow.  We re-point JAX at
the local CPU backend and force a backend re-initialization so the new
platform and XLA flags take effect.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

import jax  # noqa: E402
import jax.extend.backend  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.extend.backend.clear_backends()

# Persist compiles across test runs (4 weak cores; XLA compiles dominate).
# CAVEAT: when the axon remote-TPU plugin is registered (sitecustomize ran
# with PALLAS_AXON_POOL_IPS), some compilations can be produced on the remote
# terminal machine, whose AOT executables carry CPU features this host lacks
# (observed: silently wrong numerics from a poisoned cache entry).  In that
# configuration we keep the cache in-memory only.
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    pass  # no persistent cache under the axon-registered interpreter
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.05)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound the test process's compiler memory.

    A full run compiles hundreds of distinct XLA programs in one process;
    past ~70% of the suite the XLA CPU compiler has been observed to
    SEGFAULT under the accumulated allocator pressure.  Dropping the
    in-memory executable caches between modules keeps the process flat
    (cross-module recompiles mostly hit the persistent disk cache).
    """
    yield
    import jax
    jax.clear_caches()
