"""Test harness configuration: run everything on a virtual 8-device CPU
mesh so sharding tests exercise real collectives without TPU hardware.

Note: in this environment the JAX_PLATFORMS env var is overridden by the
axon TPU plugin; ``jax.config.update`` (before backend init) is reliable.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running multi-process / e2e tests")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
