"""Test bootstrap: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's conftest trick of pinning the runtime before
heavy imports (``tests/conftest.py:10-17`` pins OMP_NUM_THREADS): here
we pin JAX to the CPU platform with 8 virtual devices *before* jax is
imported anywhere, so multi-chip sharding paths are exercised without
TPU hardware.
"""

import os

# Force (not setdefault: the shell may preset JAX_PLATFORMS to the TPU
# platform) CPU with 8 virtual devices for every test run.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep CPU feature autotuning quiet and runs deterministic.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
