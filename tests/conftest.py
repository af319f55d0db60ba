"""Test config: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes — this file is imported before any
test module touches jax.
"""

import os

# Hard-set: the environment ships JAX_PLATFORMS=axon (remote TPU tunnel);
# unit tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
