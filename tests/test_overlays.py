"""Overlay geometry APIs — arrows, ITCZ polyline, plate borders, grids
(js/planet-mesh.js:384-617, 1289-1749)."""

import numpy as np
import pytest

from planet_heightmap_generation_tpu.config import GenerationParams
from planet_heightmap_generation_tpu.pipeline import PlanetEngine
from planet_heightmap_generation_tpu.api import overlays as ov


@pytest.fixture(scope="module")
def result(canon_engine_result):
    # the session-wide canonical climate planet (conftest) — read-only here
    return canon_engine_result[1]


def _unit(v):
    return np.linalg.norm(v, axis=-1)


def test_wind_arrows(result):
    a = ov.wind_arrows(result, "summer", spacing_deg=10.0)
    m = len(a["cells"])
    assert m > 50
    assert a["origin"].shape == (m, 3) and a["direction"].shape == (m, 3)
    np.testing.assert_allclose(_unit(a["origin"]), 1.0, atol=1e-4)
    np.testing.assert_allclose(_unit(a["direction"]), 1.0, atol=1e-3)
    # directions tangent to the sphere
    assert np.abs((a["origin"] * a["direction"]).sum(-1)).max() < 1e-3
    assert (a["speed"] >= 0).all() and a["speed"].max() <= 1.0 + 1e-5


def test_current_arrows_ocean_only(result):
    a = ov.ocean_current_arrows(result, "winter", spacing_deg=10.0)
    elev = np.asarray(result.elevation)
    assert (elev[a["cells"]] <= 0).all()
    assert "warmth" in a and np.isfinite(a["warmth"]).all()


def test_itcz_polyline(result):
    line = ov.itcz_polyline(result, "summer")
    assert line.shape[1] == 3 and len(line) >= 32
    np.testing.assert_allclose(_unit(line), 1.0, atol=1e-4)
    lat = np.degrees(np.arcsin(np.clip(line[:, 1], -1, 1)))
    assert (np.abs(lat) <= 25).all()  # ITCZ stays within ±25°


def test_plate_border_edges(result):
    edges = ov.plate_border_edges(result)
    labels = np.asarray(result.r_plate)
    assert len(edges) > 0
    assert (labels[edges[:, 0]] != labels[edges[:, 1]]).all()
    assert (edges[:, 0] < edges[:, 1]).all()  # deduplicated

    sp_edges = ov.plate_border_edges(result, super_plates=True)
    assert 0 < len(sp_edges) <= len(edges)  # super-plates merge boundaries


def test_latlon_grid():
    grid = ov.latlon_grid(30.0, segments=36)
    assert grid["parallels"].shape == (5, 37, 3)
    assert grid["meridians"].shape == (12, 37, 3)
    np.testing.assert_allclose(_unit(grid["parallels"]), 1.0, atol=1e-5)
