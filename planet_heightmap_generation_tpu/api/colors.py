"""Color maps — vectorized re-designs of js/color-map.js and the export
color functions in js/planet-mesh.js:61-100."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..climate.util import elev_to_height_km

# Satellite-view biome palette indexed by Köppen id (js/color-map.js:16-47);
# index 0 (Ocean) delegated to the elevation ramp.
BIOME_COLORS = np.array([
    [0.30, 0.50, 0.20],  # 0 Ocean placeholder (unused)
    [0.05, 0.30, 0.05], [0.08, 0.33, 0.07], [0.42, 0.50, 0.18],
    [0.82, 0.72, 0.50], [0.60, 0.55, 0.48], [0.72, 0.62, 0.30],
    [0.55, 0.52, 0.32], [0.18, 0.42, 0.12], [0.12, 0.38, 0.10],
    [0.10, 0.28, 0.10], [0.45, 0.48, 0.22], [0.40, 0.45, 0.20],
    [0.35, 0.40, 0.20], [0.20, 0.44, 0.14], [0.15, 0.40, 0.12],
    [0.12, 0.32, 0.10], [0.12, 0.36, 0.08], [0.10, 0.32, 0.08],
    [0.06, 0.22, 0.08], [0.05, 0.18, 0.07], [0.38, 0.38, 0.18],
    [0.35, 0.35, 0.17], [0.08, 0.22, 0.08], [0.06, 0.18, 0.07],
    [0.14, 0.36, 0.10], [0.12, 0.32, 0.09], [0.07, 0.22, 0.08],
    [0.05, 0.18, 0.07], [0.35, 0.32, 0.22], [0.78, 0.80, 0.84],
], dtype=np.float32)

ROCK_COLOR = np.asarray([0.42, 0.38, 0.32], np.float32)

# altitude thresholds [alpine, snow] per Köppen id (js/color-map.js:56-68)
def _thresholds_table():
    out = np.zeros((31, 2), np.float32)
    for cid in range(31):
        if cid <= 0:
            t = (0.0, 0.0)
        elif cid <= 3:
            t = (3.5, 5.5)
        elif cid <= 7:
            t = (3.0, 5.0)
        elif cid <= 16:
            t = (2.0, 3.5)
        elif cid <= 18 or cid in (21, 22, 25, 26):
            t = (1.5, 3.0)
        elif cid <= 28:
            t = (0.8, 2.0)
        elif cid == 29:
            t = (0.4, 1.5)
        else:
            t = (0.0, 0.5)
        out[cid] = t
    return out

ALTITUDE_THRESHOLDS = _thresholds_table()


def _ramp(e, lo, hi, c0, c1):
    t = (e - lo) / (hi - lo)
    return [c0[i] + t * (c1[i] - c0[i]) for i in range(3)]


@jax.jit
def elevation_to_color(e):
    """Terrain ramp (js/color-map.js:116-125). Returns [N,3]."""
    segs = [
        (-0.50, None, [0.04, 0.06, 0.30], None),
        (-0.10, -0.50, [0.04, 0.06, 0.30], [0.11, 0.20, 0.48]),
        (0.00, -0.10, [0.11, 0.20, 0.48], [0.30, 0.42, 0.60]),
        (0.03, 0.00, [0.72, 0.68, 0.46], [0.80, 0.66, 0.36]),
        (0.25, 0.03, [0.20, 0.54, 0.12], [0.14, 0.42, 0.20]),
        (0.50, 0.25, [0.14, 0.42, 0.20], [0.44, 0.28, 0.14]),
        (0.75, 0.50, [0.44, 0.28, 0.14], [0.60, 0.40, 0.32]),
    ]
    t_top = jnp.minimum(1.0, (e - 0.75) / 0.20)
    r = 0.60 + t_top * 0.35
    g = 0.40 + t_top * 0.50
    b = 0.32 + t_top * 0.60
    for hi, lo, c0, c1 in reversed(segs):
        if lo is None:
            r = jnp.where(e < hi, c0[0], r)
            g = jnp.where(e < hi, c0[1], g)
            b = jnp.where(e < hi, c0[2], b)
        else:
            t = (e - lo) / (hi - lo)
            r = jnp.where(e < hi, c0[0] + t * (c1[0] - c0[0]), r)
            g = jnp.where(e < hi, c0[1] + t * (c1[1] - c0[1]), g)
            b = jnp.where(e < hi, c0[2] + t * (c1[2] - c0[2]), b)
    return jnp.stack([r, g, b], axis=-1).astype(jnp.float32)


@jax.jit
def biome_color(koppen_id, elevation):
    """Satellite biome color with alpine/snow lines (js/color-map.js:73-114)."""
    base = jnp.asarray(BIOME_COLORS)[jnp.clip(koppen_id, 0, 30)]
    h = elev_to_height_km(elevation)
    thr = jnp.asarray(ALTITUDE_THRESHOLDS)[jnp.clip(koppen_id, 0, 30)]
    alpine, snow = thr[..., 0], thr[..., 1]

    c = base
    dark = jnp.where(h < 0.2, 0.93 + 0.07 * (h / 0.2), 1.0)
    c = c * dark[..., None]
    t_mid = jnp.clip((h - 0.2) / jnp.maximum(alpine - 0.2, 1e-6), 0.0, 1.0)
    darken = jnp.where((alpine > 0) & (h > 0.2) & (h < alpine),
                       1.0 - t_mid * 0.15, 1.0)
    c = c * darken[..., None]
    rock_zone = jnp.where(snow > alpine, snow - alpine, 2.0)
    rock_t = jnp.clip((h - alpine) / jnp.maximum(rock_zone, 1e-6), 0.0, 1.0)
    s_rock = jnp.where((alpine > 0) & (h > alpine), rock_t * rock_t, 0.0)
    c = c + (ROCK_COLOR - c) * s_rock[..., None]
    snow_t = jnp.clip((h - snow) / 2.5, 0.0, 1.0)
    s_snow = jnp.where((snow > 0) & (h > snow), snow_t * snow_t, 0.0)
    snow_c = np.asarray([0.92, 0.93, 0.96], np.float32)
    c = c + (snow_c - c) * s_snow[..., None]

    ocean = (koppen_id == 0) | (elevation <= 0)
    return jnp.where(ocean[..., None], elevation_to_color(elevation), c)


@jax.jit
def heightmap_color(elevation):
    """Absolute -5..6 km grayscale (js/planet-mesh.js:64-68)."""
    h = elev_to_height_km(elevation)
    t = jnp.clip((h + 5) / 11, 0.0, 1.0)
    return jnp.stack([t, t, t], axis=-1).astype(jnp.float32)


@jax.jit
def land_heightmap_color(elevation):
    """Ocean black, land 0..6 km grayscale (js/planet-mesh.js:71-75)."""
    t = jnp.clip(elev_to_height_km(elevation) / 6, 0.0, 1.0)
    t = jnp.where(elevation <= 0, 0.0, t)
    return jnp.stack([t, t, t], axis=-1).astype(jnp.float32)


@jax.jit
def land_mask_color(elevation):
    t = jnp.where(elevation > 0, 1.0, 0.0)
    return jnp.stack([t, t, t], axis=-1).astype(jnp.float32)
