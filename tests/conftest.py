import os

# Must run before jax is imported anywhere: force CPU with 8 virtual
# devices so multi-chip sharding tests run without a TPU pod (the
# analogue of the reference's comm_single / --partition testing modes,
# reference lib/comm_single.cpp, tests/test_util.cpp).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The environment's sitecustomize force-registers a TPU backend and wins
# over the env var, so also set the config knob explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent on-disk compilation cache for the test tier: the smoke
# suite's wall-clock is compile-dominated (the per-module
# clear_caches below forces recompiles of every solver while_loop —
# measured 28.8 s first solve vs 7.3 s replayed from the disk cache),
# and the cache survives across runs, so repeat smoke runs skip
# nearly all XLA CPU compilation.  The reference reaches the same
# goal with its persisted tunecache (lib/tune.cpp).
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound in-process compilation-cache growth: a full-suite run
    accumulates ~200 compiled executables in one process and the XLA
    CPU client has been observed to segfault in backend_compile_and_load
    near the end of hour-long single-process runs; clearing between
    modules keeps the client state small (tests re-jit per module
    anyway)."""
    yield
    import jax
    jax.clear_caches()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: full-pipeline tests (solves at tight tol in c128 on CPU); "
        "deselect with -m 'not slow' for the smoke tier")
