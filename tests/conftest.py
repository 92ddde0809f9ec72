"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py and the driver's
compile-checks; unit tests validate semantics and sharding on host.
"""

import os

# Must be set before jax imports anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
