"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py and the driver's
compile-checks; unit tests validate semantics and sharding on host.
"""

import os

# Force CPU: the image's sitecustomize pre-imports jax with the axon
# (tunneled TPU) platform, so env vars alone are too late — use
# jax.config.  XLA_FLAGS still works because backends are not
# initialized until first device access.
# RUN_TPU=1 keeps the real backend so tests/test_pallas_tpu.py (the
# real-chip kernel parity tier) can execute on the tunnel device:
#   RUN_TPU=1 pytest tests/test_pallas_tpu.py
if not os.environ.get("RUN_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if not os.environ.get("RUN_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-compile tier — runs only with RUN_SLOW=1 (the fast "
        "default tier keeps an equivalent smoke test for each)")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow tier: set RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
