import os

# Tests run on a virtual 8-device CPU mesh: fast compiles, and multi-device
# sharding tests work without TPU hardware (SURVEY.md §4c).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# The axon TPU plugin ignores JAX_PLATFORMS; JAX_PLATFORM_NAME does stick.
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: XLA compiles dominate test wall time here.
import jax

# Env vars set above only bind when present at interpreter startup (the axon
# TPU plugin pre-reads them); the config update reliably forces CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("TDGS_TEST_CACHE_DIR", "/tmp/jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# ---------------------------------------------------------------------------
# Tiered suite: tests marked @pytest.mark.slow (the multi-minute
# Pallas-interpret / long-training cases) are skipped by default so the
# verify loop stays fast; run them with `pytest --slow` (CI / pre-release).
# ---------------------------------------------------------------------------
import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run tests marked slow (full tier)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute test, opt-in via --slow"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="slow tier: run with --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
