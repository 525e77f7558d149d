"""Inspect-layer color maps and the picking/hover API (reference
index.html:286-325 layer list; js/edit-mode.js picking + hover card)."""

import numpy as np
import jax.numpy as jnp
import pytest

from planet_heightmap_generation_tpu.config import GenerationParams
from planet_heightmap_generation_tpu.pipeline import PlanetEngine
from planet_heightmap_generation_tpu.api import layers as L
from planet_heightmap_generation_tpu.api.picking import nearest_region, cell_info


@pytest.fixture(scope="module")
def result(canon_engine_result):
    # the session-wide canonical climate planet (conftest) — read-only here
    return canon_engine_result[1]


def _check_colors(c, n):
    a = np.asarray(c)
    assert a.shape == (n, 3)
    assert np.isfinite(a).all()
    assert a.min() >= -1e-5 and a.max() <= 1 + 1e-5


def test_every_available_layer_colors(result):
    names = L.available_layers(result)
    # geometry + geology + full climate stack must all be inspectable
    for required in ("terrain", "biome", "koppen", "plates", "stress",
                     "continentality", "precipSummer", "rainShadowWinter",
                     "tempSummer", "currents", "base", "hotspot",
                     "erosionDelta"):
        assert required in names, f"{required} missing from {names}"
    n = result.elevation.shape[0]
    for name in names:
        _check_colors(L.layer_color(result, name), n)


def test_unknown_layer_raises(result):
    with pytest.raises(ValueError):
        L.layer_color(result, "definitely-not-a-layer")


def test_plate_colors_distinguish_ocean_land(result):
    c = np.asarray(L.layer_color(result, "plates"))
    land_cells = ~result.plate_is_ocean[np.asarray(result.r_plate)]
    ocean_cells = result.plate_is_ocean[np.asarray(result.r_plate)]
    # land plates green-dominant, ocean plates blue-dominant on average
    assert c[land_cells][:, 1].mean() > c[land_cells][:, 2].mean()
    assert c[ocean_cells][:, 2].mean() > c[ocean_cells][:, 1].mean()


def test_nearest_region_roundtrip(result):
    g = result.graph
    for cell in (0, 123, g.n_cells - 2):
        x, y, z = g.pos[cell]
        lat = np.degrees(np.arcsin(np.clip(y, -1, 1)))
        lon = np.degrees(np.arctan2(x, z))
        assert nearest_region(result, lat, lon) == cell


def test_cell_info_fields(result):
    i = nearest_region(result, 15.0, 40.0)
    info = cell_info(result, i)
    assert abs(info["lat"] - 15.0) < 3.0 and abs(info["lon"] - 40.0) < 3.0
    assert -1.0 < info["elevation"] < 2.0
    assert info["koppen"] in __import__(
        "planet_heightmap_generation_tpu.climate.koppen",
        fromlist=["KOPPEN_CODES"]).KOPPEN_CODES
    assert -60 < info["temperature_summer_c"] < 60
    assert 0 <= info["plate"] < len(result.plate_is_ocean)
    with pytest.raises(ValueError):
        cell_info(result, 10**9)
