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
# Persistent compilation cache: model-sized jit compiles take minutes on the
# single CPU core; cache them across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_test_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import pytest


def pytest_addoption(parser):
    """--slow opt-in marker (reference tests/conftest.py:20-35)."""
    parser.addoption("--slow", action="store_true", default=False,
                     help="run slow convergence tests")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="needs --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running convergence tests")


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
