"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices (no multi-chip TPU
hardware in CI); single-chip numerics are identical between CPU and TPU for
the tolerances used here.
"""
import os

# Prefer CPU (the suite runs ~5x faster than through a tunneled TPU, with
# identical numerics at test tolerances).  When a platform plugin registered
# itself at interpreter start (axon sitecustomize), the JAX_PLATFORMS env
# write is too late (jax is already imported) — but
# jax.config.update('jax_platforms', 'cpu') still works as long as no
# backend has been initialized, which is always the case at conftest time.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def rgb_batch(rng):
    """A small batch of random RGB frames in [0,1], float32, shape (2,64,96,3)."""
    return rng.random((2, 64, 96, 3), dtype=np.float32)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-compile tests (exemplar scans)")
