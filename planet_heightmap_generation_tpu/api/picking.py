"""Region picking and cell inspection — the edit-mode/hover-card API.

The reference picks regions analytically (O(N) max-dot nearest region, no
mesh raycast — js/edit-mode.js:18-98) and shows a hover card with elevation
km, lat/lon, temperature, precipitation and Köppen class
(js/edit-mode.js:101-163). Here the same surface is a device argmax plus a
pure lookup over a ``PlanetResult``.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..climate.koppen import KOPPEN_CODES
from ..climate.util import elev_to_height_km


@jax.jit
def _nearest_idx(pos, valid, q):
    score = pos @ q
    return jnp.argmax(jnp.where(valid, score, -2.0))


def nearest_region(result, lat_deg: float, lon_deg: float) -> int:
    """Cell index nearest to (lat, lon) in degrees — the globe/map picking
    primitive (js/edit-mode.js:18-98). Y-up frame with lon = atan2(x, z),
    matching the mesh/export convention."""
    lat = math.radians(lat_deg)
    lon = math.radians(lon_deg)
    q = jnp.asarray([math.cos(lat) * math.sin(lon),
                     math.sin(lat),
                     math.cos(lat) * math.cos(lon)], jnp.float32)
    g = result.graph
    return int(_nearest_idx(jnp.asarray(g.pos), jnp.asarray(g.valid), q))


def cell_info(result, cell: int) -> Dict:
    """Hover-card fields for one cell (js/edit-mode.js:101-163): lat/lon,
    elevation km, plate id/type, and (when climate was computed) summer and
    winter temperature °C, precipitation, and the Köppen code string."""
    g = result.graph
    if not (0 <= cell < g.n_cells):
        raise ValueError(f"cell {cell} out of range [0, {g.n_cells})")
    x, y, z = (float(v) for v in g.pos[cell])
    lat = math.degrees(math.asin(max(-1.0, min(1.0, y))))
    lon = math.degrees(math.atan2(x, z))
    elev = float(np.asarray(result.elevation[cell]))
    plate = int(np.asarray(result.r_plate[cell]))
    info: Dict = dict(
        cell=cell, lat=lat, lon=lon,
        elevation=elev,
        height_km=float(np.asarray(elev_to_height_km(jnp.float32(elev)))),
        plate=plate,
        plate_is_ocean=bool(result.plate_is_ocean[plate]),
        stress=float(np.asarray(result.stress[cell])),
    )
    cl = result.climate
    if cl is not None:
        def temp_c(t01):
            return -45.0 + max(0.0, min(1.0, t01)) * 90.0
        info.update(
            temperature_summer_c=temp_c(float(np.asarray(
                cl["temp"]["r_temperature_summer"][cell]))),
            temperature_winter_c=temp_c(float(np.asarray(
                cl["temp"]["r_temperature_winter"][cell]))),
            precip_summer=float(np.asarray(cl["precip"]["r_precip_summer"][cell])),
            precip_winter=float(np.asarray(cl["precip"]["r_precip_winter"][cell])),
            koppen=KOPPEN_CODES[int(np.asarray(cl["koppen"][cell]))],
        )
    return info
