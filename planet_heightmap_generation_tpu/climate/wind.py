"""Wind simulation — ITCZ-tracking seasonal pressure fields and wind vectors.

Re-design of reference js/wind.js. Structure:

- geographic sampling for the ITCZ uses per-bin aggregates scattered on
  device (36×72 lat/lon bins) instead of the reference's CSR cell scan —
  the 288 circular samples then reduce over the tiny [36,72] grid on host;
- the periodic cubic spline (72 knots, iterative relaxation solve,
  js/wind.js:12-71) is reproduced on host in numpy and evaluated per cell
  on device (uniform knots → closed-form segment lookup);
- continentality is the main-ocean coast BFS → smoothstep(0, 2000 km)
  (js/wind.js:476-594) using the shared device BFS kernels;
- pressure, least-squares gradients and the geostrophic/friction rotation
  are fused per-cell maps.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.device import DeviceGraph
from ..ops.noise import Tables, fbm
from ..ops.graph import bfs_hops
from ..erosion.flood import open_ocean_mask
from .util import (GeoFrame, geo_frame, smoothstep, smooth_field,
                   percentile, elev_to_height_km, itcz_lookup,
                   compute_gradients)

DEG = math.pi / 180.0
LAT_BINS, LON_BINS = 36, 72
NUM_ITCZ_LON = 72


@jax.jit
def _bin_aggregates(lat, lon, elev, is_land, valid):
    """Scatter per-cell land/elev into the 36×72 geo bins (js/wind.js:88-118)."""
    bi = jnp.clip(((lat + jnp.pi / 2) / jnp.pi * LAT_BINS).astype(jnp.int32),
                  0, LAT_BINS - 1)
    bj = jnp.clip(((lon + jnp.pi) / (2 * jnp.pi) * LON_BINS).astype(jnp.int32),
                  0, LON_BINS - 1)
    b = jnp.where(valid, bi * LON_BINS + bj, LAT_BINS * LON_BINS)
    nb = LAT_BINS * LON_BINS + 1
    cnt = jnp.zeros(nb, jnp.float32).at[b].add(1.0)
    land = jnp.zeros(nb, jnp.float32).at[b].add(is_land.astype(jnp.float32))
    esum = jnp.zeros(nb, jnp.float32).at[b].add(jnp.maximum(0.0, elev))
    return cnt[:-1], land[:-1], esum[:-1]


def _geo_sample_host(cnt, land, esum, lat, lon, radius):
    """Circular sample over the binned grid (host; replaces js/wind.js:126-164).
    Bins are included when their center lies within ``radius``."""
    lat_c = (np.arange(LAT_BINS) + 0.5) / LAT_BINS * np.pi - np.pi / 2
    lon_c = (np.arange(LON_BINS) + 0.5) / LON_BINS * 2 * np.pi - np.pi
    cos_d = (np.sin(lat) * np.sin(lat_c)[:, None]
             + np.cos(lat) * np.cos(lat_c)[:, None]
             * np.cos(lon_c[None, :] - lon))
    sel = cos_d >= np.cos(radius)
    total = cnt[sel].sum()
    if total == 0:
        return 0.0, 0.0
    return land[sel].sum() / total, esum[sel].sum() / total


def _elev_to_km_scalar(e):
    if e <= 0:
        return e * 10.0
    t = min(e, 1.0)
    return 6 * t**4 * (5 - 4 * t)


def _compute_itcz_host(cnt, land, esum, season_sign):
    """ITCZ latitude per longitude (js/wind.js:174-232), host numpy."""
    lons = -np.pi + (np.arange(NUM_ITCZ_LON) + 0.5) * (2 * np.pi / NUM_ITCZ_LON)
    raw = np.zeros(NUM_ITCZ_LON)
    radius = 20 * DEG
    for i, lon in enumerate(lons):
        land_sum = elev_sum = 0.0
        samples = 0
        for deg in (5, 10, 15, 20):
            lf, ae = _geo_sample_host(cnt, land, esum, deg * season_sign * DEG,
                                      lon, radius)
            land_sum += lf
            elev_sum += ae
            samples += 1
        avg_land = land_sum / samples
        avg_elev = elev_sum / samples
        land_pull = min(1.0, avg_land * 2)
        itcz_deg = 5 + land_pull * 15 - _elev_to_km_scalar(avg_elev) * 1.5
        raw[i] = max(5.0, min(20.0, itcz_deg)) * season_sign * DEG

    # 3-pass periodic [0.25, 0.5, 0.25] smoothing + re-clamp (js/wind.js:212-228)
    lats = raw.copy()
    for _ in range(3):
        lats = 0.25 * np.roll(lats, 1) + 0.5 * lats + 0.25 * np.roll(lats, -1)
    lo = (5 if season_sign > 0 else -20) * DEG
    hi = (20 if season_sign > 0 else -5) * DEG
    lats = np.clip(lats, lo, hi)
    return lons, lats


def _build_periodic_spline(xs, ys):
    """Periodic cubic spline with the reference's 20-iteration relaxation
    solve (js/wind.js:12-53). Uniform knots."""
    n = len(xs)
    period = 2 * np.pi
    h = np.full(n, period / n)
    alpha = (3 / h) * (np.roll(ys, -1) - ys) - (3 / np.roll(h, 1)) * (ys - np.roll(ys, 1))
    c = np.zeros(n)
    for _ in range(20):
        for i in range(n):
            prev = (i - 1) % n
            nxt = (i + 1) % n
            c[i] = (alpha[i] - h[prev] * c[prev] - h[i] * c[nxt]) / (2 * (h[prev] + h[i]))
    b = (np.roll(ys, -1) - ys) / h - h * (np.roll(c, -1) + 2 * c) / 3
    d = (np.roll(c, -1) - c) / (3 * h)
    return dict(x0=xs[0], h=float(h[0]), ys=ys, b=b, c=c, d=d, n=n)


def eval_spline(spline_arrs, lon):
    """Device spline evaluation with uniform segments (js/wind.js:55-71)."""
    x0, h, ys, b, c, d = spline_arrs
    n = ys.shape[0]
    period = 2 * jnp.pi
    t = jnp.mod(jnp.mod(lon - x0, period) + period, period)
    seg = jnp.clip((t / h).astype(jnp.int32), 0, n - 1)
    dx = t - seg * h
    return ys[seg] + b[seg] * dx + c[seg] * dx * dx + d[seg] * dx * dx * dx


def _spline_to_device(sp):
    return (jnp.float32(sp["x0"]), jnp.float32(sp["h"]),
            jnp.asarray(sp["ys"], jnp.float32), jnp.asarray(sp["b"], jnp.float32),
            jnp.asarray(sp["c"], jnp.float32), jnp.asarray(sp["d"], jnp.float32))


@partial(jax.jit, static_argnames=("is_summer",))
def _pressure_kernel(pos, gf: GeoFrame, spline_arrs, continentality, elev,
                     noise_t: Tables, is_summer: bool):
    """Per-cell pressure (js/wind.js:239-301)."""
    lat, lon = gf.lat, gf.lon
    itcz_lat = eval_spline(spline_arrs, lon)
    lat_deg = lat / DEG
    season_sign = 1.0 if is_summer else -1.0

    p = 1013.0
    d_itcz = (lat - itcz_lat) / DEG
    p = p - 15 * jnp.exp(-0.5 * (d_itcz / 8) ** 2)

    shift = season_sign * 5
    high_i = 12 * (1 - 0.3 * continentality)
    p = p + high_i * jnp.exp(-0.5 * ((lat_deg - (30 + shift)) / 10) ** 2)
    p = p + high_i * jnp.exp(-0.5 * ((lat_deg + (30 - shift)) / 10) ** 2)
    p = p - 10 * jnp.exp(-0.5 * ((lat_deg - 60) / 10) ** 2)
    p = p - 10 * jnp.exp(-0.5 * ((lat_deg + 60) / 10) ** 2)
    p = p + 8 * jnp.exp(-0.5 * ((lat_deg - 85) / 8) ** 2)
    p = p + 8 * jnp.exp(-0.5 * ((lat_deg + 85) / 8) ** 2)

    # continental thermal modifier (js/wind.js:267-289)
    cont_scale = smoothstep(0.2, 0.5, continentality)
    abs_lat = jnp.abs(lat) / DEG
    lat_factor = jnp.where(
        abs_lat < 15, 0.0,
        jnp.where(abs_lat < 30, 0.75 * smoothstep(15, 30, abs_lat),
        jnp.where(abs_lat < 45, 0.75 + 0.25 * smoothstep(30, 45, abs_lat),
        jnp.where(abs_lat < 60, 1.0, smoothstep(90, 60, abs_lat)))))
    in_summer_hemi = (lat > 0) if is_summer else (lat < 0)
    thermal = jnp.where(in_summer_hemi, -10.0 * lat_factor * cont_scale,
                        14.0 * lat_factor * cont_scale)
    p = p + jnp.where(cont_scale > 0.001, thermal, 0.0)

    p = p - 3 * elev_to_height_km(jnp.maximum(0.0, elev))
    p = p + fbm(noise_t, pos[:, 0] * 2, pos[:, 1] * 2, pos[:, 2] * 2, 3) * 2
    return p.astype(jnp.float32)


@jax.jit
def _pressure_to_wind(grad_e, grad_n, sin_lat):
    """PGF rotation by geostrophic deflection − friction (js/wind.js:343-378)."""
    pgf_e, pgf_n = -grad_e, -grad_n
    sin5 = math.sin(5 * DEG)
    geo_angle = 70 * DEG * smoothstep(0.0, sin5, jnp.abs(sin_lat))
    total = jnp.where(sin_lat >= 0, -1.0, 1.0) * (geo_angle - 20 * DEG)
    ca, sa = jnp.cos(total), jnp.sin(total)
    we = (pgf_e * ca - pgf_n * sa) * 0.6
    wn = (pgf_e * sa + pgf_n * ca) * 0.6
    return we.astype(jnp.float32), wn.astype(jnp.float32), jnp.sqrt(we * we + wn * wn).astype(jnp.float32)


def compute_wind(g: DeviceGraph, elev, plate_is_ocean, r_plate,
                 noise_t: Tables, seed: int = 0) -> Dict:
    """Full wind stage (js/wind.js:394-687). Returns dict of device arrays +
    host ITCZ metadata."""
    n = g.n_cells
    avg_edge_km = (math.pi * 6371) / math.sqrt(n)

    gf = geo_frame(g.pos)
    is_land = (elev > 0) & g.valid

    # ITCZ (host over device bin aggregates)
    cnt, land_cnt, esum = _bin_aggregates(gf.lat, gf.lon, elev, is_land, g.valid)
    cnt_h, land_h, esum_h = (np.asarray(cnt).reshape(LAT_BINS, LON_BINS),
                             np.asarray(land_cnt).reshape(LAT_BINS, LON_BINS),
                             np.asarray(esum).reshape(LAT_BINS, LON_BINS))
    lons, lats_summer = _compute_itcz_host(cnt_h, land_h, esum_h, 1)
    _, lats_winter = _compute_itcz_host(cnt_h, land_h, esum_h, -1)
    sp_summer = _spline_to_device(_build_periodic_spline(lons, lats_summer))
    sp_winter = _spline_to_device(_build_periodic_spline(lons, lats_winter))

    # continentality: BFS from main-ocean coast through land (js/wind.js:476-554)
    is_ocean_cell = (~is_land) & g.valid
    main_ocean = open_ocean_mask(is_ocean_cell, g.nbr_idx, g.nbr_mask, g.valid)
    coast_seeds = is_land & jnp.any(
        main_ocean[g.nbr_idx] & g.nbr_mask, axis=1)
    coast_dist = bfs_hops(coast_seeds, ~is_land, g.nbr_idx, g.nbr_mask)
    cont = jnp.where(
        is_land & jnp.isfinite(coast_dist),
        smoothstep(0.0, 2000.0, coast_dist * avg_edge_km), 0.0)
    cont_passes = max(1, round(100 / avg_edge_km))
    cont = smooth_field(cont.astype(jnp.float32), g.nbr_idx, g.nbr_mask, cont_passes)

    # plate continentality (js/wind.js:556-593)
    plate_land = (~plate_is_ocean[r_plate]) & g.valid
    p_seeds = plate_land & jnp.any(
        (plate_is_ocean[r_plate][g.nbr_idx]) & g.nbr_mask, axis=1)
    p_dist = bfs_hops(p_seeds, ~plate_land, g.nbr_idx, g.nbr_mask)
    p_cont = jnp.where(
        plate_land & jnp.isfinite(p_dist),
        smoothstep(0.0, 2000.0, p_dist * avg_edge_km), 0.0)
    p_cont = smooth_field(p_cont.astype(jnp.float32), g.nbr_idx, g.nbr_mask, cont_passes)

    result = dict(
        r_lat=gf.lat, r_lon=gf.lon, r_sin_lat=gf.sin_lat,
        r_east=gf.east, r_north=gf.north,
        r_is_land=is_land,
        r_continentality=cont,
        r_coast_dist_land=jnp.where(jnp.isfinite(coast_dist), coast_dist, -1.0),
        r_plate_continentality=p_cont,
    )

    press_passes = max(1, round(75 / avg_edge_km))
    for name, sp in (("summer", sp_summer), ("winter", sp_winter)):
        pressure = _pressure_kernel(g.pos, gf, sp, cont, elev, noise_t,
                                    is_summer=(name == "summer"))
        pressure = smooth_field(pressure, g.nbr_idx, g.nbr_mask, press_passes)
        ge, gn = compute_gradients(g.pos, pressure, gf.east, gf.north,
                                   g.nbr_idx, g.nbr_mask)
        we, wn, speed = _pressure_to_wind(ge, gn, gf.sin_lat)
        p95 = percentile(speed, 0.95, g.valid)
        speed = jnp.minimum(1.0, speed / p95)
        result[f"r_pressure_{name}"] = pressure - 1013.0
        result[f"r_wind_east_{name}"] = we
        result[f"r_wind_north_{name}"] = wn
        result[f"r_wind_speed_{name}"] = speed

    # ITCZ samples for downstream lookup + visualization (360 points)
    m = 360
    vlons = -np.pi + (np.arange(m) + 0.5) * (2 * np.pi / m)
    def _eval_np(sp_dict, lon_arr):
        return np.asarray(eval_spline(sp_dict, jnp.asarray(lon_arr, jnp.float32)))
    result["itcz_lons"] = jnp.asarray(vlons, jnp.float32)
    result["itcz_lats_summer"] = jnp.asarray(_eval_np(sp_summer, vlons), jnp.float32)
    result["itcz_lats_winter"] = jnp.asarray(_eval_np(sp_winter, vlons), jnp.float32)
    return result
