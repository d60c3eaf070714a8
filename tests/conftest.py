import os

os.environ["JXL_TPU_NO_CACHE"] = "1"  # cross-machine XLA cache reuse warns

# Multi-device tests run on a virtual CPU mesh; set up before jax import.
# NOTE: the JAX_PLATFORMS env var is ignored when the axon TPU plugin is
# present; jax.config.update is authoritative.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run tests marked slow (exhaustive byte-identity / fuzz "
        "variants). The default run keeps a fast representative of every "
        "class; the round-gate full suite runs with --runslow.",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow variant; run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


def _n_maps():
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:  # non-Linux
        return 0


@pytest.fixture(autouse=True)
def _bound_jit_code_maps():
    """XLA:CPU's JIT never unmaps compiled code while an executable is
    referenced; a full-suite run compiles hundreds of fat programs and can
    exhaust vm.max_map_count (default 65530) -> LLVM 'Cannot allocate
    memory' aborts mid-suite. jax.clear_caches() releases the maps
    (measured: back to baseline), at the cost of recompiling shared
    programs, so clear only when the process is actually getting close."""
    yield
    if _n_maps() > 40000:
        jax.clear_caches()


@pytest.fixture(scope="session")
def testdata():
    return os.path.join(os.path.dirname(__file__), "..", "testdata")


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-12))
