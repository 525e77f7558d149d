"""Inspect layers — the full per-cell visualization surface.

The reference exposes 26 inspect layers in a dropdown (reference
index.html:286-325) colored by per-layer maps in js/planet-mesh.js
(diverging debug :83-93, precipitation :96-116, rain shadow :118-131,
continentality :133-158, temperature bands :160-172, ocean currents
:505-529, plates :180-197) and js/color-map.js (terrain ramp, biome). Here
each layer is a name → [N,3] float color array computed from a
``PlanetResult``; renderers and the PNG exporter consume them uniformly.

All color maps are vectorized jnp kernels (device) over [N] fields.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .colors import (elevation_to_color, biome_color, heightmap_color,
                     land_heightmap_color, land_mask_color)
from ..climate.koppen import KOPPEN_COLORS


# ── scalar color maps ─────────────────────────────────────────────────


@jax.jit
def diverging_color(v, scale=1.0):
    """Blue ← 0 → red diverging map for the signed geology debug layers
    (js/planet-mesh.js:83-93 equivalent)."""
    t = jnp.clip(v * scale, -1.0, 1.0)
    pos = jnp.maximum(t, 0.0)
    neg = jnp.maximum(-t, 0.0)
    r = 0.93 - 0.83 * neg
    g = 0.93 - 0.73 * (pos + neg)
    b = 0.93 - 0.83 * pos
    return jnp.stack([r, g, b], axis=-1).astype(jnp.float32)


@jax.jit
def magnitude_color(v, scale=1.0):
    """White → saturated red for non-negative magnitude layers (stress,
    wind speed): 0 = pale, 1 = strong."""
    t = jnp.clip(v * scale, 0.0, 1.0)
    r = 0.95 - 0.10 * t
    g = 0.95 - 0.80 * t
    b = 0.95 - 0.85 * t
    return jnp.stack([r, g, b], axis=-1).astype(jnp.float32)


@jax.jit
def precipitation_color(p):
    """Brown (arid) → green → blue (wet) ramp
    (js/planet-mesh.js:96-116 equivalent)."""
    t = jnp.clip(p, 0.0, 1.0)
    # two-segment blend: brown→green over [0,0.5), green→blue over [0.5,1]
    t1 = jnp.clip(t / 0.5, 0.0, 1.0)
    t2 = jnp.clip((t - 0.5) / 0.5, 0.0, 1.0)
    brown = np.asarray([0.55, 0.40, 0.20])
    green = np.asarray([0.15, 0.55, 0.20])
    blue = np.asarray([0.10, 0.30, 0.75])
    c = brown + (green - brown) * t1[..., None]
    c = jnp.where(t[..., None] > 0.5, green + (blue - green) * t2[..., None], c)
    return c.astype(jnp.float32)


@jax.jit
def rain_shadow_color(s):
    """Windward (teal, s>0) vs shadowed (orange, s<0)
    (js/planet-mesh.js:118-131 equivalent)."""
    t = jnp.clip(s, -1.0, 1.0)
    wind = jnp.maximum(t, 0.0)
    shad = jnp.maximum(-t, 0.0)
    r = 0.92 - 0.75 * wind + 0.03 * shad
    g = 0.92 - 0.25 * wind - 0.45 * shad
    b = 0.92 - 0.20 * wind - 0.80 * shad
    return jnp.stack([jnp.clip(r, 0, 1), jnp.clip(g, 0, 1),
                      jnp.clip(b, 0, 1)], axis=-1).astype(jnp.float32)


@jax.jit
def continentality_color(c):
    """Ocean-blue → coastal green → deep-interior ochre
    (js/planet-mesh.js:133-158 equivalent)."""
    t = jnp.clip(c, 0.0, 1.0)
    coast = np.asarray([0.25, 0.60, 0.40])
    interior = np.asarray([0.75, 0.55, 0.20])
    return (coast + (interior - coast) * t[..., None]).astype(jnp.float32)


@jax.jit
def temperature_color(t01):
    """Cold blue → white → hot red banded ramp on the fixed −45..45 °C
    normalization (js/planet-mesh.js:160-172 equivalent)."""
    t = jnp.clip(t01, 0.0, 1.0)
    # quantize to 12 bands like the reference's discrete legend
    tq = jnp.floor(t * 12) / 12
    cold = np.asarray([0.15, 0.25, 0.75])
    mid = np.asarray([0.93, 0.93, 0.90])
    hot = np.asarray([0.80, 0.15, 0.10])
    lo = cold + (mid - cold) * jnp.clip(tq / 0.5, 0, 1)[..., None]
    hi = mid + (hot - mid) * jnp.clip((tq - 0.5) / 0.5, 0, 1)[..., None]
    return jnp.where(tq[..., None] < 0.5, lo, hi).astype(jnp.float32)


@jax.jit
def pressure_color(p_anom_hpa):
    """Diverging pressure-anomaly map (low = purple, high = orange); the
    wind stage stores pressure − 1013 hPa."""
    t = jnp.clip(p_anom_hpa / 25.0, -1.0, 1.0)
    low = np.asarray([0.45, 0.20, 0.65])
    mid = np.asarray([0.93, 0.93, 0.93])
    high = np.asarray([0.90, 0.55, 0.15])
    c_lo = mid + (low - mid) * jnp.maximum(-t, 0.0)[..., None]
    c_hi = mid + (high - mid) * jnp.maximum(t, 0.0)[..., None]
    return jnp.where(t[..., None] < 0, c_lo, c_hi).astype(jnp.float32)


@jax.jit
def current_color(warmth, speed):
    """Ocean-current layer: warm currents red, cold blue, intensity by
    speed (js/planet-mesh.js:505-529 equivalent)."""
    s = jnp.clip(speed, 0.0, 1.0)
    w = jnp.clip(warmth, -1.0, 1.0)
    base = np.asarray([0.15, 0.20, 0.35])
    warm = np.asarray([0.85, 0.25, 0.15])
    cold = np.asarray([0.20, 0.55, 0.95])
    tint = jnp.where(w[..., None] >= 0, warm, cold)
    amt = (jnp.abs(w) * s)[..., None]
    return (base + (tint - base) * amt).astype(jnp.float32)


def plate_colors(r_plate, plate_is_ocean, num_plates: int,
                 valid=None) -> jax.Array:
    """Distinct per-plate colors, green-family for land plates and
    blue-family for ocean plates (js/planet-mesh.js:180-197 equivalent).
    Hues are golden-angle spaced per plate id for maximal separation."""
    ids = np.arange(num_plates)
    hue_t = (ids * 0.6180339887) % 1.0
    light = 0.35 + 0.35 * ((ids * 0.7548776662) % 1.0)
    is_ocean = np.asarray(plate_is_ocean)[:num_plates]

    # land: hue 70°-150° (greens); ocean: 190°-260° (blues)
    hue = np.where(is_ocean, 190 + hue_t * 70, 70 + hue_t * 80) / 360.0
    sat = np.where(is_ocean, 0.55, 0.50)

    def hsl_to_rgb(h, s, l):
        c = (1 - np.abs(2 * l - 1)) * s
        hp = h * 6.0
        x = c * (1 - np.abs(hp % 2 - 1))
        m = l - c / 2
        r = np.select([hp < 1, hp < 2, hp < 3, hp < 4, hp < 5],
                      [c, x, 0, 0, x], default=c)
        g = np.select([hp < 1, hp < 2, hp < 3, hp < 4, hp < 5],
                      [x, c, c, x, 0], default=0)
        b = np.select([hp < 1, hp < 2, hp < 3, hp < 4, hp < 5],
                      [0, 0, x, c, c], default=x)
        return np.stack([r + m, g + m, b + m], axis=-1)

    table = hsl_to_rgb(hue, sat, light).astype(np.float32)
    out = jnp.asarray(table)[jnp.clip(r_plate, 0, num_plates - 1)]
    if valid is not None:
        out = jnp.where(valid[..., None], out, 0.0)
    return out


# ── the layer registry ────────────────────────────────────────────────

GEOLOGY_DEBUG = ["base", "tectonic", "noise", "interior", "coastal",
                 "ocean", "hotspot", "backArc", "foldRidge",
                 "orogenicPower", "margins", "erosionDelta"]

LAYERS: List[str] = [
    "terrain", "biome", "koppen", "heightmap", "landheightmap", "landmask",
    "plates", "stress", "tecActivity", "superPlates",
    "pressureSummer", "pressureWinter", "windSpeedSummer", "windSpeedWinter",
    "continentality", "precipSummer", "precipWinter",
    "rainShadowSummer", "rainShadowWinter", "tempSummer", "tempWinter",
    "currents",
] + GEOLOGY_DEBUG


def available_layers(result) -> List[str]:
    """Layers computable from this result (climate layers require climate)."""
    out = ["terrain", "heightmap", "landheightmap", "landmask", "plates",
           "stress"]
    dbg = result.debug or {}
    out += [l for l in GEOLOGY_DEBUG + ["tecActivity", "superPlates"]
            if l in dbg]
    if result.climate is not None:
        out += ["biome", "koppen", "currents"]
        out += [l for l in LAYERS if l in dbg and l not in out]
    return out


def layer_color(result, name: str) -> jax.Array:
    """[N,3] float colors for the named inspect layer of a PlanetResult."""
    e = result.elevation
    dbg = result.debug or {}
    cl = result.climate

    if name == "terrain":
        return elevation_to_color(e)
    if name == "heightmap":
        return heightmap_color(e)
    if name == "landheightmap":
        return land_heightmap_color(e)
    if name == "landmask":
        return land_mask_color(e)
    if name == "plates":
        return plate_colors(result.r_plate, result.plate_is_ocean,
                            len(result.plate_is_ocean))
    if name == "stress":
        return magnitude_color(result.stress)
    if name in ("biome", "koppen"):
        if cl is None:
            raise ValueError(f"layer {name!r} requires climate")
        kop = cl["koppen"]
        if name == "koppen":
            return jnp.take(np.asarray(KOPPEN_COLORS, np.float32), axis=0, indices=
                jnp.clip(kop, 0, len(KOPPEN_COLORS) - 1))
        return biome_color(kop, e)
    if name == "currents":
        if cl is None:
            raise ValueError("layer 'currents' requires climate")
        oc = cl["ocean"]
        return current_color(oc["r_ocean_warmth_summer"],
                             oc["r_ocean_speed_summer"])
    if name.startswith(("pressure", "windSpeed", "precip", "rainShadow",
                        "temp")) or name == "continentality":
        # climate-derived debug layers share the ValueError contract of
        # biome/koppen/currents when climate was skipped
        if name not in dbg:
            raise ValueError(f"layer {name!r} requires climate")
        if name.startswith("pressure"):
            return pressure_color(dbg[name])
        if name.startswith("windSpeed"):
            return magnitude_color(dbg[name])
        if name == "continentality":
            return continentality_color(dbg[name])
        if name.startswith("precip"):
            return precipitation_color(dbg[name])
        if name.startswith("rainShadow"):
            return rain_shadow_color(dbg[name])
        return temperature_color(dbg[name])
    if name == "superPlates":
        if name not in dbg:
            raise ValueError("layer 'superPlates' not recorded "
                             "(needs >=8 plates and a full generate)")
        sp = dbg[name].astype(jnp.int32)
        n_sp = int(jnp.max(sp)) + 1
        return plate_colors(sp, np.zeros(max(n_sp, 1), bool), max(n_sp, 1))
    if name == "tecActivity":
        if name not in dbg:
            raise ValueError("layer 'tecActivity' not recorded "
                             "(imported planets have no tectonic assembly)")
        return magnitude_color(dbg[name])
    if name in GEOLOGY_DEBUG:
        if name not in dbg:
            raise ValueError(f"debug layer {name!r} not recorded")
        return diverging_color(dbg[name], scale=3.0)
    raise ValueError(f"unknown layer {name!r}")
