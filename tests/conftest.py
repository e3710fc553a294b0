"""Test environment: force CPU JAX with 8 virtual devices so sharding tests
run anywhere (the real TPU is a single chip behind a tunnel)."""

import os

# The axon TPU plugin ignores JAX_PLATFORMS; JAX_PLATFORM_NAME and the
# config update below both work — set all three for robustness.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def cloud_grid():
    """Dense WDAS sixteenth-cloud density grid (cached per session)."""
    from nrc_hpm_tpu.utils.vdb import load_vdb
    # pure-Python parser: tests also assert on grid metadata, which the
    # native fast path does not surface
    return load_vdb("/root/reference/data/volume/wdas_cloud_sixteenth.vdb",
                    prefer_native=False)


@pytest.fixture(scope="session")
def small_volume():
    """An 8^3 heterogeneous test volume."""
    from nrc_hpm_tpu.volume import Volume
    rs = np.random.RandomState(42)
    data = rs.rand(8, 8, 8).astype(np.float32)
    return Volume.from_dense(data, density_factor=0.6, g=0.8)


@pytest.fixture(scope="session")
def cube_volume():
    from nrc_hpm_tpu.volume import Volume
    return Volume.homogeneous_cube(4, 1.0, density_factor=0.5, g=0.0)
