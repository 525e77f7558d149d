"""Test configuration.

Tests default to the CPU backend: unit tests run at tiny cell counts whose
kernel shapes differ from production runs, so compiling them on the real
TPU buys no coverage and costs minutes per kernel (plus the tunnel's
~3-minute first-fetch latency per process). The TPU path itself is
exercised by bench.py and __graft_entry__.py on production shapes.

Multi-device sharding tests use a virtual 8-device CPU mesh (SURVEY.md
§4d): ``xla_force_host_platform_device_count=8`` makes ``jax.devices("cpu")``
return 8 devices, so sharded label-propagation is testable without a TPU pod.

Set PLANET_TEST_PLATFORM=tpu (or any backend name) to override.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# this jaxlib's XLA:CPU compiler intermittently segfaults/aborts deep into
# long-lived many-compile processes; single-split codegen avoids the
# suspected parallel-codegen race (and costs little on the 1-core host)
if "xla_cpu_parallel_codegen_split_count" not in flags:
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

# Default engines to the staged path in tests: the fused production path
# compiles one big XLA program per unique GenerationParams spec, which on the
# CPU test backend costs minutes per test. The fused path itself is covered
# explicitly by tests/test_fused.py (PlanetEngine(timing=False)).
os.environ.setdefault("PLANET_TIMING", "1")
# No persistent compile cache on the CPU test backend: this jaxlib's
# XLA:CPU AOT deserialization is machine-feature sensitive and
# intermittently segfaults reloading entries (see package __init__).
os.environ.setdefault("PLANET_JAX_CACHE", "0")

import jax  # noqa: E402

# sitecustomize may have imported jax already; update the live config
jax.config.update(
    "jax_platforms", os.environ.get("PLANET_TEST_PLATFORM", "cpu"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def cpu_devices():
    """The virtual CPU mesh devices (always ≥8 thanks to XLA_FLAGS)."""
    return jax.devices("cpu")


# One canonical planet spec shared by every product-surface test file
# (pipeline, layers, overlays, globe, picking). A single staged generate
# compiles the whole kernel set once per session; aligning every engine
# test to THIS shape family (4000 cells / 12 plates) means later generates
# reuse the in-process jit cache instead of recompiling per file.
CANON_PARAMS_KW = dict(seed=77, n_cells=4000, n_plates=12, num_continents=2,
                       skip_climate=False)


@pytest.fixture(scope="session")
def canon_engine_result():
    """(engine, result) of the canonical 4K generate WITH climate. Files
    that only read the result must not mutate the engine state (reapply /
    edit_recompute belong to test_pipeline, which owns the command order)."""
    from planet_heightmap_generation_tpu.config import GenerationParams
    from planet_heightmap_generation_tpu.pipeline import PlanetEngine

    engine = PlanetEngine()
    result = engine.generate(GenerationParams(**CANON_PARAMS_KW))
    return engine, result


@pytest.fixture(scope="session")
def tiny_sphere():
    """A small shared mesh fixture (N=2000) for graph-algorithm tests."""
    from planet_heightmap_generation_tpu.mesh import build_sphere

    return build_sphere(2000, 0.75, seed=42.0)


@pytest.fixture(scope="session")
def rng_cls():
    from planet_heightmap_generation_tpu.ops.rng import ParkMiller

    return ParkMiller
