"""Test configuration: force CPU with 8 virtual devices so the whole suite
(including sharded halo-exchange tests) runs without TPU hardware.  Pallas
kernels run in interpret mode on CPU (auto-detected by the ops layer).

Must set env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize force-sets jax_platforms="axon,cpu"
# at interpreter start, overriding JAX_PLATFORMS.  Override it back:
# without this, "CPU" tests silently run op-by-op over the TPU tunnel
# (catastrophically slow).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
