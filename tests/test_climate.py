"""Climate stack tests (SURVEY.md §2.6): wind/pressure structure, ocean
gyres, precipitation patterns, temperature gradients, Köppen coverage."""

import numpy as np
import jax.numpy as jnp
import pytest

from planet_heightmap_generation_tpu.mesh import build_sphere
from planet_heightmap_generation_tpu.mesh.device import to_device
from planet_heightmap_generation_tpu.ops.noise import SimplexNoise, tables
from planet_heightmap_generation_tpu.climate import (
    compute_wind, compute_ocean_currents, compute_precipitation,
    compute_temperature, classify_koppen, KOPPEN_CODES,
)
from planet_heightmap_generation_tpu.climate.util import (
    smooth_field, percentile, elev_to_height_km, geo_frame,
)


@pytest.fixture(scope="module")
def world():
    """Synthetic world: one continent blob + latitude-tilted terrain.
    Plate layout mirrors land so plate continentality works."""
    g = build_sphere(4000, 0.5, seed=9.0)
    gd = to_device(g)
    sn = SimplexNoise(9.0)
    pos = g.pos
    e = np.asarray(sn.fbm(pos[:, 0] * 1.5, pos[:, 1] * 1.5, pos[:, 2] * 1.5)) * 0.8
    e = np.where(g.valid, e - 0.15, 0.0).astype(np.float32)
    elev = jnp.asarray(e)
    # two synthetic plates: land plate where elev>0 else ocean plate
    r_plate = jnp.asarray((e > 0).astype(np.int32))
    plate_is_ocean = jnp.asarray(np.array([True, False]))
    noise_t = tables(9.0)
    wind = compute_wind(gd, elev, plate_is_ocean, r_plate, noise_t)
    return g, gd, elev, wind


def test_util_smooth_and_percentile(tiny_sphere):
    gd = to_device(tiny_sphere)
    f = jnp.asarray(np.arange(gd.n_padded, dtype=np.float32))
    sm = smooth_field(f, gd.nbr_idx, gd.nbr_mask, 2)
    assert np.isfinite(np.asarray(sm)).all()
    p = float(percentile(f, 0.5, gd.valid))
    assert abs(p - tiny_sphere.n_cells / 2) < tiny_sphere.n_cells * 0.02


def test_elev_to_height_km():
    assert float(elev_to_height_km(jnp.float32(-0.5))) == pytest.approx(-5.0)
    assert float(elev_to_height_km(jnp.float32(0.0))) == pytest.approx(0.0)
    assert float(elev_to_height_km(jnp.float32(1.0))) == pytest.approx(6.0)


def test_geo_frame(tiny_sphere):
    gd = to_device(tiny_sphere)
    gf = geo_frame(gd.pos)
    lat = np.asarray(gf.lat)
    assert (np.abs(lat) <= np.pi / 2 + 1e-6).all()
    # east/north orthonormal to position
    e = np.asarray(gf.east)
    n = np.asarray(gf.north)
    p = np.asarray(gd.pos)
    assert np.abs((e * p).sum(1)).max() < 1e-5
    assert np.abs((e * n).sum(1)).max() < 1e-4


def test_wind_outputs(world):
    g, gd, elev, wind = world
    for k in ("r_pressure_summer", "r_wind_east_summer", "r_wind_speed_winter",
              "r_continentality", "itcz_lats_summer"):
        assert k in wind
    sp = np.asarray(wind["r_wind_speed_summer"])[: g.n_cells]
    assert (sp >= 0).all() and (sp <= 1 + 1e-6).all()
    # ITCZ in summer hemisphere band [5°, 20°]
    lats = np.degrees(np.asarray(wind["itcz_lats_summer"]))
    assert (lats >= 4.9).all() and (lats <= 20.1).all()
    lats_w = np.degrees(np.asarray(wind["itcz_lats_winter"]))
    assert (lats_w <= -4.9).all() and (lats_w >= -20.1).all()
    # continentality zero on ocean, grows inland
    cont = np.asarray(wind["r_continentality"])[: g.n_cells]
    land = np.asarray(wind["r_is_land"])[: g.n_cells]
    assert cont[land].mean() > cont[~land].mean()


def test_pressure_has_zonal_structure(world):
    g, gd, elev, wind = world
    lat = np.degrees(np.asarray(wind["r_lat"]))[: g.n_cells]
    p = np.asarray(wind["r_pressure_summer"])[: g.n_cells]
    # subtropical highs > subpolar lows on average
    subtrop = p[(np.abs(lat) > 25) & (np.abs(lat) < 40)].mean()
    subpolar = p[(np.abs(lat) > 55) & (np.abs(lat) < 65)].mean()
    assert subtrop > subpolar


def test_ocean_currents(world):
    g, gd, elev, wind = world
    ocean = compute_ocean_currents(gd, elev, wind)
    ce = np.asarray(ocean["r_ocean_current_east_summer"])[: g.n_cells]
    land = np.asarray(wind["r_is_land"])[: g.n_cells]
    assert (ce[land] == 0).all()
    assert np.abs(ce[~land]).max() > 0
    w = np.asarray(ocean["r_ocean_warmth_summer"])[: g.n_cells]
    assert (w >= -1).all() and (w <= 1).all()
    # trades: westward flow in deep tropics open ocean
    lat = np.degrees(np.asarray(wind["r_lat"]))[: g.n_cells]
    mask = (~land) & (np.abs(lat) > 10) & (np.abs(lat) < 25)
    if mask.sum() > 30:
        assert ce[mask].mean() < 0


def test_precip_temp_koppen(world):
    g, gd, elev, wind = world
    ocean = compute_ocean_currents(gd, elev, wind)
    precip = compute_precipitation(gd, elev, wind, ocean)
    for season in ("summer", "winter"):
        p = np.asarray(precip[f"r_precip_{season}"])[: g.n_cells]
        assert (p >= 0).all() and (p <= 1 + 1e-6).all()
        assert p.std() > 0.05  # spatial structure exists

    temp = compute_temperature(gd, elev, wind, ocean, precip)
    t = np.asarray(temp["r_temperature_summer"])[: g.n_cells]
    assert (t >= 0).all() and (t <= 1).all()
    lat = np.asarray(wind["r_lat"])[: g.n_cells]
    # tropics warmer than poles
    assert t[np.abs(lat) < 0.3].mean() > t[np.abs(lat) > 1.2].mean() + 0.1

    kop = np.asarray(classify_koppen(
        elev, temp["r_temperature_summer"], temp["r_temperature_winter"],
        precip["r_precip_summer"], precip["r_precip_winter"]))[: g.n_cells]
    assert (kop >= 0).all() and (kop < len(KOPPEN_CODES)).all()
    land = np.asarray(wind["r_is_land"])[: g.n_cells]
    assert (kop[~land] == 0).all()
    assert (kop[land] != 0).all()
    # diverse climates on a noise continent spanning latitudes
    assert len(np.unique(kop[land])) >= 5


def test_koppen_truth_table():
    """Golden cases for the classifier."""
    elev = jnp.asarray(np.full(6, 0.3, np.float32))
    # columns: ts, tw (0-1 of -45..45), ps, pw (0-1 → mm*1000)
    ts = jnp.asarray(np.array([
        (28 + 45) / 90,   # tropical rainforest: hot all year, wet
        (30 + 45) / 90,   # hot desert: hot, dry
        (22 + 45) / 90,   # mediterranean-ish: warm summer, mild winter, dry summer
        (20 + 45) / 90,   # continental: warm summer, frozen winter
        (5 + 45) / 90,    # tundra: cool summer
        (-10 + 45) / 90,  # ice cap
    ], np.float32))
    tw = jnp.asarray(np.array([
        (24 + 45) / 90, (18 + 45) / 90, (8 + 45) / 90,
        (-12 + 45) / 90, (-25 + 45) / 90, (-40 + 45) / 90,
    ], np.float32))
    ps = jnp.asarray(np.array([0.9, 0.02, 0.05, 0.45, 0.2, 0.1], np.float32))
    pw = jnp.asarray(np.array([0.8, 0.01, 0.5, 0.3, 0.15, 0.1], np.float32))
    kop = np.asarray(classify_koppen(elev, ts, tw, ps, pw))
    codes = [KOPPEN_CODES[k] for k in kop]
    assert codes[0] == "Af"
    assert codes[1] in ("BWh", "BWk")
    assert codes[2].startswith("Cs")
    assert codes[3].startswith("D")
    assert codes[4] == "ET"
    assert codes[5] == "EF"
