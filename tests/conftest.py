"""Test env: force CPU backend with 8 virtual devices (SURVEY.md §4.4).

The container's sitecustomize pins JAX_PLATFORMS=axon (the tunneled TPU), so
env vars alone are ignored; ``jax.config.update`` after import wins. The
XLA flag must be set before the CPU backend initializes (lazy, so conftest
import time is early enough).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ASSETS = "/root/reference/sceneResources"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")
