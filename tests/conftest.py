"""Test config: force an 8-virtual-device CPU mesh so tests are
hardware-independent and sharding tests run without TPU chips
(SURVEY.md §4: distributed tests on a CPU mesh).

Note: the hosted `axon` TPU plugin ignores the JAX_PLATFORMS env var, so we
force the platform through jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite's wall time is dominated by XLA CPU
# compiles of the jitted trainers/kernels; caching them roughly halves a
# warm run (measured 56s -> 27s on the fast tier). Keyed by HLO, so code
# changes invalidate exactly the programs they alter.
from motionbert_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.environ.get(
    "MOTIONBERT_TEST_COMPILE_CACHE", "/tmp/motionbert_xla_cache_tests"))


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (the full e2e tier)")


def pytest_collection_modifyitems(config, items):
    """Default run skips the slow tier (e2e smoke trainers, full-model
    grad parity, heavyweight goldens) so `pytest tests/ -q` stays under
    ~5 minutes; CI-full / pre-release runs pass --runslow (or RUN_SLOW=1)
    for the whole suite."""
    if config.getoption("--runslow") or \
            os.environ.get("RUN_SLOW", "") not in ("", "0"):
        return
    skip = pytest.mark.skip(
        reason="slow tier: pass --runslow (or RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
