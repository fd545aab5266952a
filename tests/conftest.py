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

jax.config.update("jax_platforms", "cpu")
