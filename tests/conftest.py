"""Test configuration: force CPU backend with 8 virtual devices so sharded
code paths are testable without a TPU pod (SURVEY.md §4d)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_sphere():
    """A small shared mesh fixture (N=2000) for graph-algorithm tests."""
    from planet_heightmap_generation_tpu.mesh import build_sphere

    return build_sphere(2000, 0.75, seed=42.0)


@pytest.fixture(scope="session")
def rng_cls():
    from planet_heightmap_generation_tpu.ops.rng import ParkMiller

    return ParkMiller
