"""Test configuration: fake 8-device CPU backend (SURVEY.md §4).

Must set env BEFORE jax initializes a backend — this file is imported by
pytest before any test module imports jax.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the host env pins 'axon'
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The machine's sitecustomize pre-imports jax, so the env var above is read
# too late; jax.config still wins if set before first backend use.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run tests marked slow (full end-to-end drives; the "
             "default tier stays under ~10 min on the 1-core host)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="slow tier: run with --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def tiny_dataset():
    """Synthetic dataset shaped like the real one but tiny (fast CI)."""
    from ertdx import data as data_lib
    rng = np.random.default_rng(0)
    n, p, l, c = 64, 29, 96, 4
    sim_param = rng.uniform(0.1, 0.9, size=(n, p, 1))
    ert = rng.normal(50.0, 10.0, size=(n, l, c))
    return data_lib.prepare_dataset(sim_param, ert)
