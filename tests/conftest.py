"""Test harness config: force an 8-device virtual CPU mesh (SURVEY.md §4).

Must set the env vars before jax is imported anywhere in the test process —
this file is imported by pytest before any test module.
"""

import os

# The container's sitecustomize registers the axon TPU PJRT plugin whenever
# PALLAS_AXON_POOL_IPS is non-empty, which overrides JAX_PLATFORMS=cpu —
# clear it so tests get a deterministic 8-device virtual CPU mesh.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
