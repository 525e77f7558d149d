"""Native coarse-fill parity: the C++ kernel must produce bit-identical
plates and RNG stream positions to the pure-Python fallback."""

import numpy as np
import pytest

import planet_heightmap_generation_tpu.native as native_mod
from planet_heightmap_generation_tpu.mesh import build_sphere
from planet_heightmap_generation_tpu.tectonics.plates import generate_plates


@pytest.fixture(scope="module")
def small_graph():
    return build_sphere(3000, 0.75, seed=137.0)


def _force_python():
    saved = (native_mod._LIB, native_mod._TRIED)
    native_mod._LIB, native_mod._TRIED = None, True
    return saved


def _restore(saved):
    native_mod._LIB, native_mod._TRIED = saved


def test_native_available():
    assert native_mod.get_coarse_fill() is not None, \
        "native coarse_fill failed to build"


def test_native_matches_python(small_graph):
    """The native fill and the pure-Python fallback consume identical RNG
    streams (seeds/poles/omega bit-equal). Cell assignments may diverge at
    exact scoring near-ties (float summation-order differences between
    numpy and plain C at the last ulp) — bounded to <0.2% of cells."""
    rp_native, plates_n = generate_plates(small_graph, 24, 7)
    saved = _force_python()
    try:
        rp_py, plates_p = generate_plates(small_graph, 24, 7)
    finally:
        _restore(saved)
    n = small_graph.n_cells
    ndiff = int((np.asarray(rp_native)[:n] != np.asarray(rp_py)[:n]).sum())
    assert ndiff <= max(2, 0.002 * n), f"{ndiff} cells differ"
    # RNG stream resumed at the identical position → identical Euler poles
    np.testing.assert_array_equal(plates_n.pole, plates_p.pole)
    np.testing.assert_array_equal(plates_n.omega, plates_p.omega)
    np.testing.assert_array_equal(plates_n.seeds, plates_p.seeds)
