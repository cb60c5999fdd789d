"""Test configuration: force the CPU backend with 8 virtual devices.

Tests must run without TPU hardware; multi-device sharding tests use the
standard XLA host-platform trick (SURVEY.md §4).  The environment's
sitecustomize pre-sets jax_platforms to "axon,cpu" (real-TPU tunnel), so the
env var alone is not enough — we override the config before any backend
initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_np():
    return np.random.default_rng(1234)
