"""Test configuration: force CPU with 8 virtual devices so sharding tests
run anywhere (the driver validates real-TPU behavior separately)."""

import os

# Note: the ambient environment may preset JAX_PLATFORMS (e.g. to a remote
# TPU plugin whose sitecustomize bakes the value in before conftest runs);
# tests must run on the virtual-device CPU backend regardless, so override
# both the env var and the already-materialized jax config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
