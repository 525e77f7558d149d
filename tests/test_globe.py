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
def result(canon_engine_result):
    # the session-wide canonical climate planet (conftest) — read-only here
    return canon_engine_result[1]


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
    assert size == manifest["total_bytes"]
    assert size > manifest["positions_bytes"] + manifest["colors_bytes"]
    assert manifest["vertices"] == 3 * 3 * len(result.graph.triangles)
    text = open(html).read()
    assert "webgl2" in text and "globe.bin" in text


def test_export_globe_cells_block(result, tmp_path):
    """Per-cell picking/hover/map data rides the bin (the viewer's map mode
    + analytical max-dot picking, reference js/planet-mesh.js:200-382,
    js/edit-mode.js:18-98)."""
    export_globe(result, str(tmp_path), layer="terrain")
    manifest = json.load(open(tmp_path / "globe.json"))
    cells = manifest["cells"]
    n = result.graph.n_cells
    assert cells["count"] == n
    raw = open(tmp_path / "globe.bin", "rb").read()
    pos = np.frombuffer(raw, "<f4", count=n * 3,
                        offset=cells["pos"]["offset"]).reshape(n, 3)
    assert np.allclose(np.linalg.norm(pos, axis=1), 1.0, atol=1e-3)
    tri_cell = np.frombuffer(raw, "<i4", count=manifest["vertices"] // 3,
                             offset=cells["tri_cell"]["offset"])
    assert tri_cell.min() >= 0 and tri_cell.max() < n
    elev = np.frombuffer(raw, "<f4", count=n, offset=cells["elev"]["offset"])
    ref = np.asarray(result.elevation)[:n]
    assert np.array_equal(elev, ref.astype(np.float32))
    # viewer has the map/picking machinery
    text = open(tmp_path / "globe.html").read()
    for needle in ("buildMapPositions", "nearestCell", "koppen_legend",
                   "antimeridian"):
        assert needle in text, needle
    assert len(manifest["koppen_legend"]) == 31


def test_export_globe_map_view_projection(result, tmp_path):
    """`--view map` provenance + the viewer's equirect projection contract
    (reference js/planet-mesh.js:200-382): after the antimeridian +2 shift,
    every triangle is lon-contiguous (spread <= 1) except pole fans, which
    the viewer collapses to their circular-mean longitude (they occupy the
    map's extreme edge rows, so a zero-width sliver is invisible)."""
    export_globe(result, str(tmp_path), layer="terrain", view="map")
    manifest = json.load(open(tmp_path / "globe.json"))
    assert manifest["initial_view"] == "map"
    text = open(tmp_path / "globe.html").read()
    assert 'initial_view === "map"' in text and "setMode(true)" in text

    raw = open(tmp_path / "globe.bin", "rb").read()
    pos = np.frombuffer(raw, "<f4",
                        count=manifest["vertices"] * 3).reshape(-1, 3)
    r = np.linalg.norm(pos, axis=1)
    y = (np.arcsin(np.clip(pos[:, 1] / r, -1, 1)) / np.pi).reshape(-1, 3)
    x = (np.arctan2(pos[:, 0], pos[:, 2]) / np.pi).reshape(-1, 3)
    spread = x.max(1) - x.min(1)
    am = spread > 1
    x2 = x.copy()
    x2[am] = np.where(x[am] < 0, x[am] + 2, x[am])
    bad = (x2.max(1) - x2.min(1)) > 1
    # every still-wide triangle must be a pole fan (viewer collapses those)
    assert (np.abs(y[bad]).max(1) > 0.45).all()
    assert bad.sum() <= 8, int(bad.sum())
    # shifted map coordinates stay inside the wrap-clone range the viewer
    # draws at xoff in {-2, 0, 2}
    assert x2.min() >= -1.0 - 1e-6 and x2.max() <= 3.0 + 1e-6
