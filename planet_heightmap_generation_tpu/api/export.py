"""Equirectangular map export — device-side Voronoi rasterization.

The reference renders the Voronoi map mesh with WebGL in ≤2048² tiles and
stitches a PNG up to 65_536 px wide (js/planet-mesh.js:1752-1950). The
TPU-native replacement rasterizes directly, two ways:

- in-memory rasters: each cell id is scattered to its equirect pixel, then
  a **jump-flood (JFA) Voronoi fill** propagates the nearest cell id across
  the image in O(log max_dim) gather passes — the nearest-cell metric is
  the true spherical dot product, and horizontal neighbors wrap.
- huge exports (up to the reference's 65_536 px): ``export_map_tiled``
  renders in ROW BANDS, each band's pixels resolved to their exact nearest
  cell through a covering lat/lon candidate index (mesh/geobins.py), and
  streams the PNG band by band — no full-image array ever exists, so width
  is bounded by disk, not HBM.

Color space: the reference's WebGL path converts its sRGB palette to linear
for rendering and back to sRGB on readback (js/planet-mesh.js:1752-1950) —
a round trip. Here cells are flat-colored with the sRGB palette directly
(no linear-space interpolation happens), so written PNGs already match the
reference's output space; ``linear_to_srgb`` is provided for custom fields.

Export types mirror the reference's six (color / biome / koppen /
heightmap / landheightmap / landmask, js/planet-mesh.js:1782-1792).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.device import DeviceGraph
from .colors import (elevation_to_color, biome_color, heightmap_color,
                     land_heightmap_color, land_mask_color)
from ..climate.koppen import KOPPEN_COLORS


@partial(jax.jit, static_argnames=("height", "width"))
def rasterize_cell_ids(g: DeviceGraph, height: int, width: int) -> jax.Array:
    """[H, W] int32 nearest-cell ids via scatter-seed + jump flooding."""
    x, y, z = g.pos[:, 0], g.pos[:, 1], g.pos[:, 2]
    lat = jnp.arcsin(jnp.clip(y, -1.0, 1.0))
    lon = jnp.arctan2(x, z)
    px = jnp.clip(((lon / jnp.pi + 1) * 0.5 * width).astype(jnp.int32), 0, width - 1)
    py = jnp.clip(((0.5 - lat / jnp.pi) * height).astype(jnp.int32), 0, height - 1)

    n = g.pos.shape[0]
    flat = jnp.where(g.valid, py * width + px, height * width)
    ids = jnp.full(height * width + 1, -1, jnp.int32).at[flat].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")[:-1].reshape(height, width)

    # pixel sphere positions
    plat = (0.5 - (jnp.arange(height, dtype=jnp.float32) + 0.5) / height) * jnp.pi
    plon = ((jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2 - 1) * jnp.pi
    cl = jnp.cos(plat)[:, None]
    ppos = jnp.stack([
        cl * jnp.sin(plon)[None, :],
        jnp.broadcast_to(jnp.sin(plat)[:, None], (height, width)),
        cl * jnp.cos(plon)[None, :],
    ], axis=-1)  # [H, W, 3], matching lon = atan2(x, z)

    pos_ext = jnp.concatenate([g.pos, jnp.zeros((1, 3), g.pos.dtype)])

    def score(ids_hw):
        cpos = pos_ext[jnp.where(ids_hw >= 0, ids_hw, n)]
        s = jnp.sum(cpos * ppos, axis=-1)
        return jnp.where(ids_hw >= 0, s, -2.0)

    steps = []
    k = max(height, width) // 2
    while k >= 1:
        steps.append(k)
        k //= 2
    if steps and steps[-1] != 1:
        steps.append(1)

    for k in steps:
        best = ids
        best_s = score(ids)
        for dy in (-k, 0, k):
            for dx in (-k, 0, k):
                if dx == 0 and dy == 0:
                    continue
                cand = jnp.roll(ids, (dy, dx), axis=(0, 1))
                if dy != 0:
                    # vertical shifts must not wrap across poles
                    if dy > 0:
                        cand = cand.at[:dy, :].set(-1)
                    else:
                        cand = cand.at[dy:, :].set(-1)
                s = score(cand)
                take = s > best_s
                best = jnp.where(take, cand, best)
                best_s = jnp.where(take, s, best_s)
        ids = best
    return ids


EXPORT_TYPES = ("color", "biome", "koppen", "heightmap", "landheightmap",
                "landmask")


def export_map(g: DeviceGraph, elevation, export_type: str = "heightmap",
               height: int = 1024, width: int = 2048,
               koppen: Optional[jax.Array] = None,
               cell_ids: Optional[jax.Array] = None) -> np.ndarray:
    """Render one export type to an [H, W, 3] float32 image (0..1).
    Pass a precomputed ``cell_ids`` raster to share it across types
    (the reference's exportMapBatch, js/planet-mesh.js:1965-2180)."""
    if export_type not in EXPORT_TYPES:
        raise ValueError(f"unknown export type {export_type!r}")
    if export_type in ("biome", "koppen") and koppen is None:
        raise ValueError(f"{export_type} export requires the koppen field")

    if cell_ids is None:
        cell_ids = rasterize_cell_ids(g, height, width)
    e = elevation[cell_ids]

    if export_type == "heightmap":
        img = heightmap_color(e)
    elif export_type == "landheightmap":
        img = land_heightmap_color(e)
    elif export_type == "landmask":
        img = land_mask_color(e)
    elif export_type == "color":
        img = elevation_to_color(e)
    elif export_type == "koppen":
        kop = koppen[cell_ids]
        img = jnp.take(np.asarray(KOPPEN_COLORS, np.float32), axis=0, indices=
            jnp.clip(kop, 0, len(KOPPEN_COLORS) - 1))
    else:  # biome
        kop = koppen[cell_ids]
        img = biome_color(kop, e)
    return np.asarray(img)


def export_map_batch(g: DeviceGraph, elevation, types, height=1024,
                     width=2048, koppen=None):
    """Shared-raster multi-type export (Export All)."""
    ids = rasterize_cell_ids(g, height, width)
    return {t: export_map(g, elevation, t, height, width, koppen, cell_ids=ids)
            for t in types}


def linear_to_srgb(c):
    """IEC 61966-2-1 linear → sRGB transfer (js/planet-mesh.js:1930-1941's
    readback conversion), for custom linear-space fields."""
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, c * 12.92,
                     1.055 * jnp.power(c, 1.0 / 2.4) - 0.055)


@partial(jax.jit, static_argnames=("n_lat", "n_lon", "band_h", "width",
                                   "height"))
def _band_cell_ids(pos, bins_idx, bins_mask, bins_points,
                   n_lat: int, n_lon: int, band_row, band_h: int,
                   height: int, width: int):
    """Exact nearest-cell ids for one row band via the covering index.
    ``band_row`` is TRACED (a scalar offset): a 65_536-px export is 16+
    bands and must reuse ONE compiled kernel, not one per band."""
    from ..mesh.geobins import nearest_cell

    rows = jnp.float32(band_row) + jnp.arange(band_h, dtype=jnp.float32)
    plat = (0.5 - (rows + 0.5) / height) * jnp.pi
    plon = ((jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2 - 1) * jnp.pi
    cl = jnp.cos(plat)[:, None]
    ppos = jnp.stack([
        cl * jnp.sin(plon)[None, :],
        jnp.broadcast_to(jnp.sin(plat)[:, None], (band_h, width)),
        cl * jnp.cos(plon)[None, :],
    ], axis=-1).reshape(-1, 3)
    ids = nearest_cell(bins_idx, bins_mask, bins_points, n_lat, n_lon, ppos)
    return ids.reshape(band_h, width)


def export_map_tiled(graph, elevation, export_type: str, path: str,
                     width: int = 16384, height: Optional[int] = None,
                     koppen: Optional[jax.Array] = None,
                     band_h: Optional[int] = None) -> None:
    """Stream one export type to a PNG of arbitrary width (reference ceiling
    65_536 px, js/planet-mesh.js:1856-1864) in ``band_h``-row bands.

    ``graph`` is the host SphereGraph (the covering candidate index is built
    from its real-cell positions, sized so bands resolve EXACT nearest
    cells). Peak memory is one band, not the image.
    """
    import math as _math
    from ..mesh.geobins import build_geobins
    from .colors import (elevation_to_color, biome_color, heightmap_color,
                         land_heightmap_color, land_mask_color)

    if export_type not in EXPORT_TYPES:
        raise ValueError(f"unknown export type {export_type!r}")
    if export_type in ("biome", "koppen") and koppen is None:
        raise ValueError(f"{export_type} export requires the koppen field")
    height = height or width // 2

    n = graph.n_cells
    # bin grid ~mesh-resolution so candidate lists stay narrow
    n_lat = int(min(512, max(45, _math.sqrt(n) / 4)))
    bins = build_geobins(graph.pos[:n], n_lat=n_lat, n_lon=2 * n_lat)
    bi = jnp.asarray(bins.cand_idx)
    bm = jnp.asarray(bins.cand_mask)
    bp = jnp.asarray(bins.points)
    pos = jnp.asarray(graph.pos)
    elevation = jnp.asarray(elevation)

    if band_h is None:
        # bound the [band_h*W, K_c, 3] candidate gather to ~1.5 GB
        k_c = bins.cand_idx.shape[1]
        band_h = max(16, min(2048, (3 << 29) // max(1, width * k_c * 16)))

    def colorize(ids):
        e = elevation[ids]
        if export_type == "heightmap":
            return heightmap_color(e)
        if export_type == "landheightmap":
            return land_heightmap_color(e)
        if export_type == "landmask":
            return land_mask_color(e)
        if export_type == "color":
            return elevation_to_color(e)
        kop = koppen[ids]
        if export_type == "koppen":
            return jnp.take(np.asarray(KOPPEN_COLORS, np.float32), axis=0, indices=
                jnp.clip(kop, 0, len(KOPPEN_COLORS) - 1))
        return biome_color(kop, e)

    with _PngStream(path, width, height) as png:
        for row in range(0, height, band_h):
            h = min(band_h, height - row)
            ids = _band_cell_ids(pos, bi, bm, bp, bins.n_lat, bins.n_lon,
                                 row, band_h, height, width)[:h]
            band = np.asarray(colorize(ids))
            png.write_rows(band)


class _PngStream:
    """Incremental 8-bit RGB PNG writer: one IDAT stream fed band by band,
    so a 65_536×32_768 export never holds the image in memory."""

    def __init__(self, path: str, width: int, height: int):
        self.path = path
        self.w = width
        self.h = height
        self.rows_written = 0

    def __enter__(self):
        import struct
        import zlib
        self._struct = struct
        self._zlib = zlib
        self.f = open(self.path, "wb")
        self.f.write(b"\x89PNG\r\n\x1a\n")
        header = struct.pack(">IIBBBBB", self.w, self.h, 8, 2, 0, 0, 0)
        self._chunk(b"IHDR", header)
        self._comp = zlib.compressobj(6)
        self._buf = b""
        return self

    def _chunk(self, tag, data):
        s = self._struct
        self.f.write(s.pack(">I", len(data)) + tag + data
                     + s.pack(">I", self._zlib.crc32(tag + data) & 0xFFFFFFFF))

    def write_rows(self, band: np.ndarray):
        rgb8 = np.clip(band * 255.0 + 0.5, 0, 255).astype(np.uint8)
        filt = np.concatenate(
            [np.zeros((rgb8.shape[0], 1), np.uint8),
             rgb8.reshape(rgb8.shape[0], -1)], axis=1)
        self._buf += self._comp.compress(filt.tobytes())
        if len(self._buf) > (1 << 22):
            self._chunk(b"IDAT", self._buf)
            self._buf = b""
        self.rows_written += rgb8.shape[0]

    def __exit__(self, et, ev, tb):
        if et is None:
            self._buf += self._comp.flush()
            if self._buf:
                self._chunk(b"IDAT", self._buf)
            self._chunk(b"IEND", b"")
        self.f.close()
        return False


def save_png(image: np.ndarray, path: str) -> None:
    """Minimal PNG writer (no external deps): 8-bit RGB."""
    import struct
    import zlib

    h, w = image.shape[:2]
    rgb8 = np.clip(np.asarray(image) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    raw = b"".join(
        b"\x00" + rgb8[row].tobytes() for row in range(h))

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    header = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", header)
           + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)
