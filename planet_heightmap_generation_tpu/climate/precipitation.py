"""Precipitation — upwind moisture advection + mechanism stack + rain-shadow
propagation, blended 50-50 with the heuristic zonal model.

Re-design of reference js/precipitation.js. The advection and shadow loops
are directed propagation sweeps: the wind-alignment weights are
loop-invariant, so they are computed once as [N,K] arrays and each sweep is
a masked weighted gather under ``lax.fori_loop`` — ~100 full-mesh passes per
season in the reference become fused VPU iterations here.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from ..mesh.device import DeviceGraph
from .util import (smoothstep, smooth_field, percentile, elev_to_height_km,
                   itcz_lookup, compute_gradients)
from .heuristic_precip import heuristic_wind_field, heuristic_precip_season

DEG = math.pi / 180.0


@jax.jit
def _wind_convergence(pos, wind3d, nbr_idx, nbr_mask):
    """Net inward flux (js/precipitation.js:19-52)."""
    d = pos[nbr_idx] - pos[:, None, :]
    w_sum = wind3d[nbr_idx] + wind3d[:, None, :]
    conv = -jnp.sum(jnp.where(nbr_mask[:, :, None], w_sum * d, 0.0), axis=(1, 2))
    cnt = jnp.maximum(1, jnp.sum(nbr_mask, axis=1))
    return (conv / cnt).astype(jnp.float32)


@partial(jax.jit, static_argnames=("max_hops",))
def _advect_moisture(pos, height_km, is_land, wind3d, ocean_warmth,
                     coast_dist_land, nbr_idx, nbr_mask, max_hops: int):
    """Upwind moisture advection (js/precipitation.js:59-182)."""
    n = pos.shape[0]

    # seed moisture
    ocean_nb = (~is_land)[nbr_idx] & nbr_mask
    d_out = pos[nbr_idx] - pos[:, None, :]
    ocean_dir = jnp.sum(jnp.where(ocean_nb[:, :, None], d_out, 0.0), axis=1)
    ocean_cnt = jnp.sum(ocean_nb, axis=1)
    warmth_avg = jnp.sum(jnp.where(ocean_nb, ocean_warmth[nbr_idx], 0.0), axis=1) \
        / jnp.maximum(1, ocean_cnt)
    wind_dot_ocean = jnp.einsum("nc,nc->n", wind3d, ocean_dir)
    onshore = jnp.where(wind_dot_ocean < 0, 1.0, 0.25)
    warmth_factor = 0.5 + 0.5 * jnp.clip(warmth_avg, -0.8, 1.0)
    coast_seed = is_land & (coast_dist_land == 0) & (ocean_cnt > 0)
    moisture = jnp.where(
        ~is_land, 0.4 + 0.35 * jnp.maximum(0.0, ocean_warmth),
        jnp.where(coast_seed, onshore * warmth_factor, 0.0)).astype(jnp.float32)

    # loop-invariant upwind weights: wind at nb pointing toward r
    d_in = pos[:, None, :] - pos[nbr_idx]
    up_w = jnp.einsum("nkc,nkc->nk", wind3d[nbr_idx], d_in)
    up_w = jnp.where(nbr_mask & (up_w > 0), up_w, 0.0)
    up_sum = jnp.sum(up_w, axis=1)
    has_up = up_sum > 0

    up_height = jnp.sum(up_w * height_km[nbr_idx], axis=1) / jnp.maximum(up_sum, 1e-20)
    height_gain = jnp.maximum(0.0, height_km - up_height)
    depletion_base = 1 - 0.78 ** (1.0 / max_hops)
    elev_depletion = jnp.minimum(0.8, height_gain * max_hops * 0.55)
    retain = jnp.maximum(0.0, 1 - (depletion_base + elev_depletion))

    wind_mag_ok = jnp.einsum("nc,nc->n", wind3d, wind3d) >= 1e-6
    active = is_land & wind_mag_ok & has_up

    def body(_, m):
        incoming = jnp.sum(up_w * m[nbr_idx], axis=1) / jnp.maximum(up_sum, 1e-20)
        carried = incoming * retain
        return jnp.where(active, jnp.maximum(m, carried), m)

    return jax.lax.fori_loop(0, max_hops, body, moisture)


@partial(jax.jit, static_argnames=("max_hops", "lee_hops", "is_summer"))
def _mechanisms(lat, lon, elev, height_km, is_land, continentality,
                coast_dist_land, moisture, convergence, pressure_dev,
                wind_e, wind_n, elev_grad_e, elev_grad_n, itcz_lats,
                avg_edge_rad, avg_edge_km, precipitation_offset,
                land_coverage, max_hops: int, lee_hops: int, is_summer: bool):
    """The per-cell mechanism stack (js/precipitation.js:307-487)."""
    abs_lat = jnp.abs(lat) / DEG
    p = moisture

    # (a) ITCZ uplift
    itcz_lat = itcz_lookup(itcz_lats, lon)
    dist_itcz = jnp.abs(lat - itcz_lat) / DEG
    itcz_strength = smoothstep(15.0, 0.0, dist_itcz)
    core = jnp.where(dist_itcz < 5, 1.5, 1.0)
    p = jnp.where(dist_itcz < 15,
                  p * (1 + itcz_strength * core) + itcz_strength * 0.3, p)

    # (b) convergence boost
    conv_strength = jnp.minimum(1.0, (convergence / avg_edge_rad) * 0.055)
    p = jnp.where(convergence > 0,
                  p * (1 + conv_strength * 1.2) + conv_strength * moisture * 0.4, p)

    # (c) local orographic windward/lee
    wdg = wind_e * elev_grad_e + wind_n * elev_grad_n
    uplift = jnp.minimum(1.0, wdg * 15)
    shadow = jnp.minimum(1.0, -wdg * 18)
    oro_land = is_land & (elev > 0)
    p = jnp.where(oro_land & (wdg > 0), p + uplift * 1.0, p)
    p = jnp.where(oro_land & (wdg <= 0),
                  p * jnp.maximum(0.02, 1 - shadow * 0.95), p)

    # (d) seasonal subtropical suppression + monsoon relief + pressure mod
    in_local_summer = (lat >= 0) if is_summer else (lat < 0)
    subtrop_center = jnp.where(in_local_summer, 30.0, 24.0)
    subtrop_width = jnp.where(in_local_summer, 16.0, 12.0)
    subtrop_peak = jnp.where(in_local_summer, 0.50, 0.30)

    poleward_wind = jnp.where(lat >= 0, wind_n, -wind_n)
    coast_dist = jnp.where(coast_dist_land >= 0, coast_dist_land, float(max_hops))
    coast_prox = 1 - smoothstep(0.0, max_hops * 0.4, coast_dist)
    monsoon = smoothstep(0.0, 0.15, poleward_wind) * coast_prox
    subtrop_peak = subtrop_peak * jnp.where(
        is_land & in_local_summer & (poleward_wind > 0), 1 - monsoon * 0.7, 1.0)

    subtrop_dist = jnp.abs(abs_lat - subtrop_center)
    lat_suppress = jnp.where(
        subtrop_dist < subtrop_width,
        smoothstep(subtrop_width, jnp.zeros_like(subtrop_width), subtrop_dist) * subtrop_peak,
        0.0)
    pressure_mod = jnp.where(
        pressure_dev > 0, smoothstep(0.0, 12.0, pressure_dev) * 0.25,
        -smoothstep(0.0, 15.0, -pressure_dev) * 0.2)
    total_suppress = lat_suppress + pressure_mod
    p = jnp.where(total_suppress > 0,
                  p * jnp.maximum(0.05, 1 - total_suppress),
                  p * (1 - total_suppress))

    # (e) polar front
    polar = smoothstep(40.0, 70.0, abs_lat)
    inland_fade = 1 - smoothstep(0.0, float(max_hops), coast_dist)
    p = jnp.where(abs_lat > 40,
                  (p + polar * 0.10 + polar * 0.20 * inland_fade) * (1 + polar * 0.15),
                  p)

    # (f) continental dryness
    cont = jnp.where(is_land, continentality, 0.0)
    p = jnp.where(cont > 0, p * jnp.maximum(0.03, 1 - cont * cont * 0.55), p)

    # (g) lee cyclogenesis
    p = p + jnp.where(
        is_land & (height_km > 1.5) & (wdg < -0.01)
        & (coast_dist_land >= 0) & (coast_dist_land < lee_hops),
        0.15 * jnp.minimum(1.0, height_km / 5), 0.0)

    # ocean baseline
    hp_fade = jnp.where(pressure_dev > 0, smoothstep(0.0, 12.0, pressure_dev), 0.0)
    p = jnp.where(~is_land, jnp.maximum(p, 0.15 * (1 - hp_fade)), p)

    # (h) hard coast cutoff
    dist_km = coast_dist_land * avg_edge_km
    fade = 1 - smoothstep(2000.0, 3000.0, dist_km)
    p = jnp.where(is_land & (coast_dist_land > 0) & (dist_km > 2000),
                  p * jnp.maximum(0.03, fade), p)

    p = p * (1 + precipitation_offset * 0.5)
    t_lc = jnp.maximum(0.0, (land_coverage - 0.4) / 0.6)
    p = p * (1 - t_lc * t_lc * 0.98)
    return jnp.maximum(0.0, p).astype(jnp.float32)


@partial(jax.jit, static_argnames=("shadow_hops", "windward_hops"))
def _rain_shadow(pos, elev, height_km, is_land, wind3d, wind_e, wind_n,
                 elev_grad_e, elev_grad_n, nbr_idx, nbr_mask,
                 shadow_hops: int, windward_hops: int):
    """Rain-shadow diagnostic: seed on ≥0.8 km slopes, propagate shadow
    downwind / windward rain upwind (js/precipitation.js:496-607)."""
    wdg = wind_e * elev_grad_e + wind_n * elev_grad_n
    h_scale = jnp.minimum(1.0, (height_km - 0.5) / 2.5)
    seed_ok = is_land & (elev > 0) & (height_km >= 0.8)
    seed = jnp.where(
        seed_ok & (wdg > 0), jnp.minimum(1.0, wdg * 20) * h_scale,
        jnp.where(seed_ok & (wdg < 0), -jnp.minimum(1.0, -wdg * 18) * h_scale,
                  0.0)).astype(jnp.float32)

    d_in = pos[:, None, :] - pos[nbr_idx]
    up_w = jnp.einsum("nkc,nkc->nk", wind3d[nbr_idx], d_in)
    up_w = jnp.where(nbr_mask & (up_w > 0) & is_land[:, None], up_w, 0.0)
    dn_w = -jnp.einsum("nc,nkc->nk", wind3d, d_in)
    dn_w = jnp.where(nbr_mask & (dn_w > 0) & is_land[:, None], dn_w, 0.0)

    shadow_decay = 1 - 0.15 ** (1.0 / shadow_hops)
    windward_decay = 1 - 0.25 ** (1.0 / windward_hops)

    def shadow_body(_, s):
        vals = s[nbr_idx]
        neg = jnp.where(vals < 0, vals, 0.0)
        w = jnp.where(vals < 0, up_w, 0.0)
        wsum = jnp.sum(w, axis=1)
        carried = jnp.sum(neg * w, axis=1) / jnp.maximum(wsum, 1e-20) * (1 - shadow_decay)
        return jnp.where(wsum > 0, jnp.minimum(s, carried), s)

    shadow_f = jax.lax.fori_loop(0, shadow_hops, shadow_body, seed)
    shadow_f = jnp.minimum(shadow_f, seed)

    def windward_body(_, s):
        vals = s[nbr_idx]
        pos_v = jnp.where(vals > 0, vals, 0.0)
        w = jnp.where(vals > 0, dn_w, 0.0)
        wsum = jnp.sum(w, axis=1)
        carried = jnp.sum(pos_v * w, axis=1) / jnp.maximum(wsum, 1e-20) * (1 - windward_decay)
        return jnp.where(wsum > 0, jnp.maximum(s, carried), s)

    windward_f = jax.lax.fori_loop(0, windward_hops, windward_body, seed)
    windward_f = jnp.maximum(windward_f, seed)

    return jnp.where(shadow_f < 0, shadow_f, windward_f).astype(jnp.float32)


def compute_precipitation(g: DeviceGraph, elev, wind: Dict, ocean: Dict,
                          precipitation_offset: float = 0.0,
                          land_coverage: float = 0.3) -> Dict:
    n = g.n_cells
    avg_edge_km = (math.pi * 6371) / math.sqrt(n)
    avg_edge_rad = math.pi / math.sqrt(n)
    max_hops = max(8, min(20, round(2000 / avg_edge_km)))

    lat, lon = wind["r_lat"], wind["r_lon"]
    is_land = wind["r_is_land"]
    cont = wind["r_continentality"]
    coast_dist = wind["r_coast_dist_land"]
    east, north = wind["r_east"], wind["r_north"]

    # smoothed elevation gradients (js/precipitation.js:216-233)
    elev_passes = max(2, round(200 / avg_edge_km))
    elev_sm = smooth_field(elev.astype(jnp.float32), g.nbr_idx, g.nbr_mask,
                           elev_passes)
    elev_sm = elev_sm * 0.6 + elev * 0.4
    grad_e, grad_n = compute_gradients(g.pos, elev_sm, east, north,
                                       g.nbr_idx, g.nbr_mask)
    height_km = elev_to_height_km(jnp.maximum(0.0, elev))

    conv_passes = max(3, round(400 / avg_edge_km))
    shadow_hops = max(8, round(2500 / avg_edge_km))
    windward_hops = max(6, round(1500 / avg_edge_km))
    rs_passes = max(2, round(150 / avg_edge_km))
    precip_passes = max(1, round(100 / avg_edge_km))
    wc_passes = max(2, round(300 / avg_edge_km))

    result = {}
    for name in ("summer", "winter"):
        is_summer = name == "summer"
        itcz_lats = wind[f"itcz_lats_{name}"]
        warmth = ocean[f"r_ocean_warmth_{name}"]

        # 50-50 blend with heuristic zonal wind (js/precipitation.js:262-270)
        h_we, h_wn = heuristic_wind_field(lat, lon, itcz_lats)
        we = 0.5 * wind[f"r_wind_east_{name}"] + 0.5 * h_we
        wn = 0.5 * wind[f"r_wind_north_{name}"] + 0.5 * h_wn
        wind3d = we[:, None] * east + wn[:, None] * north

        conv = _wind_convergence(g.pos, wind3d, g.nbr_idx, g.nbr_mask)
        conv = smooth_field(conv, g.nbr_idx, g.nbr_mask, conv_passes)

        moisture = _advect_moisture(g.pos, height_km, is_land, wind3d, warmth,
                                    coast_dist, g.nbr_idx, g.nbr_mask, max_hops)

        precip = _mechanisms(
            lat, lon, elev, height_km, is_land, cont, coast_dist,
            moisture, conv, wind[f"r_pressure_{name}"], we, wn,
            grad_e, grad_n, itcz_lats,
            jnp.float32(avg_edge_rad), jnp.float32(avg_edge_km),
            jnp.float32(precipitation_offset), jnp.float32(land_coverage),
            max_hops, max(2, round(200 / avg_edge_km)), is_summer)

        rs = _rain_shadow(g.pos, elev, height_km, is_land, wind3d, we, wn,
                          grad_e, grad_n, g.nbr_idx, g.nbr_mask,
                          shadow_hops, windward_hops)
        rs = smooth_field(rs, g.nbr_idx, g.nbr_mask, rs_passes)

        # apply propagated shadow (js/precipitation.js:616-627)
        strength = jnp.minimum(1.0, -rs * 2.25)
        precip = jnp.where(is_land & (rs < -0.01),
                           precip * jnp.maximum(0.02, 1 - strength * 0.92), precip)
        precip = jnp.where(is_land & (rs > 0.01), precip + rs * 1.2, precip)

        precip = smooth_field(precip, g.nbr_idx, g.nbr_mask, precip_passes)

        # heuristic blend (js/precipitation.js:644-679)
        heur = heuristic_precip_season(
            g.pos, lat, lon, elev, is_land, cont, coast_dist,
            grad_e, grad_n, east, itcz_lats, g.nbr_idx, g.nbr_mask,
            avg_edge_km, wc_passes, precip_passes, is_summer)
        blended = 0.5 * precip + 0.5 * heur
        p95 = percentile(blended, 0.95, g.valid)
        blended = jnp.minimum(1.0, blended / p95)

        cap = 1.0 - smoothstep(0.5, 1.0, cont) * 0.80
        blended = jnp.where(is_land & (cont > 0.5),
                            jnp.minimum(blended, cap), blended)

        result[f"r_precip_{name}"] = blended.astype(jnp.float32)
        result[f"r_rainshadow_{name}"] = rs
    return result
