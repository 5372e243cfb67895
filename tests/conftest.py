"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip sharding (shard_map/pjit over a Mesh) is validated on a virtual
CPU mesh; the axon TPU plugin otherwise grabs the backend (and its f64
emulation is range-limited), so tests must run on CPU. x64 is enabled:
the f64 precision path is the golden reference against the CPU reference
implementation.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

# A long pytest process accumulates hundreds of LLVM-JIT'd XLA
# executables; at the kernel-default vm.max_map_count (65530) the
# process eventually exhausts its mmap budget and the NEXT compile
# segfaults (reproduced deterministically at the 34th test of
# test_tree.py; gone at 1048576). Best-effort bump — root-only write,
# silently skipped elsewhere.
try:  # pragma: no cover - environment repair
    with open("/proc/sys/vm/max_map_count") as _f:
        if int(_f.read()) < 262144:
            with open("/proc/sys/vm/max_map_count", "w") as _g:
                _g.write("1048576")
except OSError:
    pass

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import sys  # noqa: E402
from pathlib import Path  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_PATH = Path("/root/reference")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run @pytest.mark.slow (compile-heavy) tests")


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (VERDICT r1 #6): the default tier must stay green in
    CI-scale time on this single-core container, so compile-heavy cases
    (tree/P3M numerics, multi-minute sharded parity sweeps) are marked
    ``slow`` and skipped unless --runslow (or an explicit -m expression
    naming 'slow') opts in."""
    if config.getoption("--runslow"):
        return
    if "slow" in (config.getoption("-m") or ""):
        return  # explicit -m slow / -m "not slow" takes over
    skip_slow = pytest.mark.skip(
        reason="slow tier: pass --runslow (or -m slow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(scope="session")
def reference():
    """Import the reference implementation (golden comparisons); skip if the
    reference checkout is not mounted."""
    if not (REFERENCE_PATH / "core").exists():
        pytest.skip("reference checkout not available")
    sys.path.insert(0, str(REFERENCE_PATH))
    import core.body
    import core.datasets
    import core.engine
    import core.physics

    yield sys.modules
    sys.path.remove(str(REFERENCE_PATH))


@pytest.fixture
def rng():
    return np.random.default_rng(42)
