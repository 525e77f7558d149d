"""Renderer-bridge geometry: per-halfedge globe triangles + viewer export."""

import json
import os

import numpy as np
import pytest

from planet_heightmap_generation_tpu.config import GenerationParams
from planet_heightmap_generation_tpu.pipeline import PlanetEngine
from planet_heightmap_generation_tpu.api.globe import (build_globe_geometry,
                                                       export_globe,
                                                       DISPLACE,
                                                       OCEAN_DEPTH_SCALE)


@pytest.fixture(scope="module")
def result():
    params = GenerationParams(seed=5, n_cells=3000, n_plates=10,
                              num_continents=2, skip_climate=True)
    return PlanetEngine().generate(params)


def test_globe_geometry_shape_and_bounds(result):
    geo = build_globe_geometry(result, "terrain")
    pos = geo["positions"]
    t = len(result.graph.triangles)
    assert pos.shape == (3 * t, 3, 3)  # one triangle per halfedge
    assert np.isfinite(pos).all()
    radii = np.linalg.norm(pos.reshape(-1, 3), axis=1)
    e = np.asarray(result.elevation)
    # triangle centers are means of unit vectors → norm slightly < 1
    # (chord sag ~ edge²/8); allow 1% on the low side
    lo = (1 + DISPLACE * OCEAN_DEPTH_SCALE * e.min()) * 0.99
    hi = 1 + DISPLACE * e.max() + 1e-3
    assert radii.min() >= lo and radii.max() <= hi
    col = geo["colors"]
    assert col.shape == pos.shape
    assert (col >= 0).all() and (col <= 1).all()


def test_globe_winding_outward(result):
    geo = build_globe_geometry(result, "terrain")
    pos = geo["positions"]
    n = np.cross(pos[:, 1] - pos[:, 0], pos[:, 2] - pos[:, 0])
    center = pos.mean(axis=1)
    outward = np.einsum("sc,sc->s", n, center) >= 0
    assert outward.mean() > 0.999


def test_export_globe_files(result, tmp_path):
    html = export_globe(result, str(tmp_path), layer="terrain")
    assert os.path.exists(html)
    manifest = json.load(open(tmp_path / "globe.json"))
    size = os.path.getsize(tmp_path / "globe.bin")
    assert size == manifest["positions_bytes"] + manifest["colors_bytes"]
    assert manifest["vertices"] == 3 * 3 * len(result.graph.triangles)
    text = open(html).read()
    assert "webgl2" in text and "globe.bin" in text
