"""Test bootstrap: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's conftest trick of pinning the runtime before
heavy imports (``tests/conftest.py:10-17`` pins OMP_NUM_THREADS). In
this environment jax may already be imported (and defaulted to the
tunneled TPU platform) before conftest runs, so env vars are too late —
``jax.config.update`` still works until the first backend call, and
pins every test to a virtual 8-device CPU mesh: multi-chip sharding
paths are exercised without TPU hardware, and the test suite never
contends for the single tunneled TPU chip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any spawned subprocesses

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Every test not marked ``slow`` gets ``quick``: the review-loop
    tier is ``pytest -m quick`` (equivalently ``-m "not slow"``)."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
