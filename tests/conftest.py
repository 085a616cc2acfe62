"""Test configuration: force CPU with 8 virtual devices so sharding tests
run anywhere (the driver validates real-TPU behavior separately)."""

import os

# Note: the ambient environment may preset JAX_PLATFORMS (e.g. to a TPU
# plugin); tests must run on the virtual-device CPU backend regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
