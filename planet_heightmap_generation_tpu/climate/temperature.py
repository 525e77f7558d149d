"""Temperature — ITCZ-based curves, moisture-dependent lapse, ocean warmth,
maritime/continental seasonal swing.

Re-design of reference js/temperature.js: the diffused-ocean-warmth loop
(gated by plate continentality) is an unrolled masked smoothing, everything
else a fused per-cell map. Output normalized to [0,1] over -45..+45 °C.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from ..mesh.device import DeviceGraph
from ..ops.banded import banded_sum, banded_count, smooth_field_banded
from .util import smoothstep, elev_to_height_km, itcz_lookup

DEG = math.pi / 180.0
T_MIN, T_MAX = -45.0, 45.0


def _diffuse_ocean_warmth(warmth2, is_land, plate_cont,
                          band_off, band_mask, rem_src, rem_dst,
                          passes: int):
    """js/temperature.js:19-54 — all cells diffuse except deep continental
    interiors (plate continentality ≥ 0.95). Both seasons diffuse stacked
    as banded roll sums ([N,2] per pass); ~70 passes at 1M, so the TPU
    path rides the pallas smoothing kernel with a per-pass freeze
    restore (frozen cells keep their value but still contribute)."""
    from ..ops.sweep_pallas import use_pallas

    impl = (_diffuse_warmth_pallas if use_pallas(band_mask.shape[0])
            else _diffuse_warmth_jnp)
    return impl(warmth2, is_land, plate_cont, band_off, band_mask,
                rem_src, rem_dst, passes)


@partial(jax.jit, static_argnames=("band_off", "passes"))
def _diffuse_warmth_jnp(warmth2, is_land, plate_cont,
                        band_off, band_mask, rem_src, rem_dst,
                        passes: int):
    field = jnp.where((~is_land)[:, None], warmth2, 0.0).astype(jnp.float32)
    frozen = (plate_cont >= 0.95)[:, None]
    c = (1 + banded_count(band_mask, rem_src, dtype=jnp.float32))[:, None]

    # fori_loop, not unrolled: ~1400 km of diffusion is dozens of passes at
    # 1M cells and unrolled passes bloat the climate executable (cold-start
    # cost = executable bytes over the tunnel)
    def body(_, f):
        s = f + banded_sum(f, band_off, band_mask, rem_src, rem_dst)
        return jnp.where(frozen, f, s / c)

    return jax.lax.fori_loop(0, passes, body, field)


@partial(jax.jit, static_argnames=("band_off", "passes"))
def _diffuse_warmth_pallas(warmth2, is_land, plate_cont,
                           band_off, band_mask, rem_src, rem_dst,
                           passes: int):
    from ..ops.sweep_pallas import SmoothSweeper, pack_band_bits
    from ..ops.banded import _smooth_rem_setup

    n = band_mask.shape[0]
    field = jnp.where((~is_land)[:, None], warmth2, 0.0).astype(jnp.float32)
    frozen = (plate_cont >= 0.95)
    sw = SmoothSweeper(band_off, 2, n, masked=False)
    deg = banded_count(band_mask, rem_src, dtype=jnp.float32)
    inv = sw.pad((1.0 / (deg + 1.0))[None, :])
    bits = sw.pad(pack_band_bits(band_mask).reshape(1, n))
    fp = sw.pad(field.T)
    frozen_p = sw.pad(frozen[None, :])
    real, src, dst = _smooth_rem_setup(rem_src, rem_dst, n, sw.np8)

    def body(_, fp):
        rem = jnp.zeros((2, sw.np8), jnp.float32).at[:, src].add(
            jnp.where(real, fp[:, dst], 0.0), mode="drop")
        new = sw.sweep(fp, None, bits, rem, inv)
        return jnp.where(frozen_p > 0, fp, new)

    fp = jax.lax.fori_loop(0, passes, body, fp)
    return fp[:, :n].T.astype(jnp.float32)


@partial(jax.jit, static_argnames=("is_summer",))
def _temperature_kernel(lat, lon, elev, is_land, cont, p_cont, itcz_lats,
                        warmth, speed, precip, coastal_warmth,
                        temperature_offset, is_summer: bool):
    tropical_hw = 13.0
    max_dist = 90.0 - tropical_hw

    itcz_lat = itcz_lookup(itcz_lats, lon)
    dist_itcz = jnp.abs(lat - itcz_lat) / DEG
    t_itcz = jnp.maximum(0.0, dist_itcz - tropical_hw) / max_dist
    T_i = 28 - 47 * jnp.power(t_itcz, 1.4)

    flat_itcz = (5.0 if is_summer else -5.0) * DEG
    dist_flat = jnp.abs(lat - flat_itcz) / DEG
    t_flat = jnp.maximum(0.0, dist_flat - tropical_hw) / max_dist
    T_f = 28 - 47 * jnp.power(t_flat, 1.4)

    abs_lat = jnp.abs(lat) / DEG
    blend = smoothstep(45.0, 90.0, abs_lat)
    T = T_i * (1 - blend) + T_f * blend

    lapse = 4.5 + 4.8 * (1 - precip)
    h_km = elev_to_height_km(elev)
    T = T - jnp.where(is_land & (elev > 0), lapse * h_km, 0.0)

    # ocean SST shift / coastal diffused warmth (js/temperature.js:151-165)
    T = T + jnp.where(
        ~is_land, warmth * jnp.minimum(1.0, speed * 2) * 16,
        jnp.where(jnp.abs(coastal_warmth) > 0.001,
                  coastal_warmth * (1 - smoothstep(0.0, 0.95, p_cont)) * 20, 0.0))

    # cloud moderation (js/temperature.js:167-180)
    T = jnp.where(precip > 0.5, T * (1 - smoothstep(0.5, 1.0, precip) * 0.15), T)
    T = jnp.where(precip < 0.3, T * (1 + smoothstep(0.3, 0.0, precip) * 0.15), T)

    # maritime/continental seasonal swing (js/temperature.js:186-208)
    dist_ann = abs_lat
    t_ann = jnp.maximum(0.0, dist_ann - tropical_hw) / max_dist
    T_annual = 28 - 47 * jnp.power(t_ann, 1.4)
    T_ann_adj = jnp.where(is_land & (elev > 0), T_annual - lapse * h_km, T_annual)
    deviation = T - T_ann_adj
    seasonal_boost = 12 * smoothstep(10.0, 55.0, dist_ann) * (1 - smoothstep(75.0, 90.0, dist_ann))
    is_local_summer = (lat >= 0) if is_summer else (lat < 0)
    season_sign = jnp.where(is_local_summer, 1.0, -1.0)
    maritime = 0.50 + cont * 0.70
    T = T_ann_adj + (deviation + season_sign * seasonal_boost) * maritime

    return (T + temperature_offset).astype(jnp.float32)


def compute_temperature(g: DeviceGraph, elev, wind: Dict, ocean: Dict,
                        precip: Dict, temperature_offset: float = 0.0) -> Dict:
    n = g.n_cells
    avg_edge_km = (math.pi * 6371) / math.sqrt(n)
    warmth_passes = max(4, round(1400 / avg_edge_km))

    lat, lon = wind["r_lat"], wind["r_lon"]
    is_land = wind["r_is_land"]
    cont = wind["r_continentality"]
    p_cont = wind["r_plate_continentality"]

    warmth2 = jnp.stack([ocean["r_ocean_warmth_summer"],
                         ocean["r_ocean_warmth_winter"]], 1)
    coastal2 = _diffuse_ocean_warmth(warmth2, is_land, p_cont,
                                     *g.bands, warmth_passes)

    t_l = []
    for s, name in enumerate(("summer", "winter")):
        T = _temperature_kernel(
            lat, lon, elev, is_land, cont, p_cont,
            wind[f"itcz_lats_{name}"], warmth2[:, s],
            ocean[f"r_ocean_speed_{name}"], precip[f"r_precip_{name}"],
            coastal2[:, s],
            jnp.float32(temperature_offset), is_summer=(name == "summer"))
        t_l.append(T)
    t2 = smooth_field_banded(jnp.stack(t_l, 1), *g.bands, 1)

    result = {}
    for s, name in enumerate(("summer", "winter")):
        result[f"r_temperature_{name}"] = jnp.clip(
            (t2[:, s] - T_MIN) / (T_MAX - T_MIN), 0.0, 1.0).astype(jnp.float32)
    return result
