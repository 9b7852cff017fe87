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
