"""Reference-transcribed golden values (VERDICT r2 #6 / SURVEY §4c).

No JS runtime exists in this container, so pipeline-level dumps can't be
produced here — instead these tests pin the PURE-SCALAR contracts directly
against values transcribed by hand from the reference source:

- Köppen truth-table rows: inputs in the classifier's own units
  (normalized two-season temperature/precip) → expected class id, each row
  hand-evaluated against the decision rules in js/koppen.js:123-284.
- Planet codes: a fully hand-packed mixed-radix BigInt example
  (js/planet-code.js:197-246) → expected base36 string, plus synthetic
  codes for every legacy length (13/14/16/17/18/21/22) built from known
  index values and decoded field-by-field.
- Heightmap import curve: grayscale→elevation goldens
  (js/planet-worker.js:705-708).

If any of these deviate from the reference-transcribed goldens the planet
codes stop being interchangeable / the classifier stops matching the
reference palette semantics — these fail against the CONTRACT, not against
a previous build of this repo.
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from planet_heightmap_generation_tpu.climate.koppen import (
    classify_koppen, KOPPEN_CODES)
from planet_heightmap_generation_tpu.api.planet_code import (
    encode_planet_code, decode_planet_code)

_ID = {c: i for i, c in enumerate(KOPPEN_CODES)}


def _tn(t_c):
    """°C → the classifier's normalized unit (js/temperature.js:216-226)."""
    return (t_c + 45.0) / 90.0


def _pn(mm):
    """half-year mm → normalized precip (js/koppen.js:104-106)."""
    return mm / 1000.0


# (name, elev, Ts°C, Tw°C, Ps mm, Pw mm, expected class id)
# Each expectation hand-derived from js/koppen.js:
#   Thot/Tcold=max/min(Ts,Tw); Tann=mean; Tshoulder=Thot-(Thot-Tcold)/3
#   polar short-circuit (Thot<0→EF, <10→ET) BEFORE the aridity test;
#   Pthresh = 20·Tann + {280 if local-summer frac≥0.7, 0 if ≤0.3, 140};
#   B if Pann<Pthresh (desert below half, steppe above; h/k at Tann 18);
#   A: Af if Pdry≥60, Am if Pann≥25·(100−Pdry), else Aw;
#   s: local PsMonth<50 and <PwMonth/2;  w: PwMonth<PsMonth/10;
#   letter: a Thot≥22, b Tshoulder≥10, c Tcold≥−38, d below;  C?d→Cfb.
KOPPEN_ROWS = [
    ("ocean", -0.2, 20, 10, 500, 500, _ID["Ocean"]),
    ("EF ice cap (Thot<0)", 0.3, -10, -30, 100, 100, _ID["EF"]),
    ("ET tundra (0<=Thot<10)", 0.3, 5, -20, 200, 200, _ID["ET"]),
    # polar short-circuits BEFORE the aridity test (js/koppen.js:146-148)
    ("ET beats arid", 0.3, 8, -25, 20, 20, _ID["ET"]),
    ("Af rainforest (Pdry=116.7>=60)", 0.1, 30, 25, 900, 700, _ID["Af"]),
    ("Am monsoon (Pdry=50, Pann=2600>=1250)", 0.1, 30, 25, 2300, 300,
     _ID["Am"]),
    ("Aw savanna (Pann=800<2083)", 0.1, 30, 20, 700, 100, _ID["Aw"]),
    # arid B overrides tropical temps (step 2 precedes step 3)
    ("BWh beats A (Pann=140<345)", 0.1, 33, 22, 80, 60, _ID["BWh"]),
    ("BWh at zero precip (summerFrac defaults 0.5)", 0.1, 30, 20, 0, 0,
     _ID["BWh"]),
    ("BWk cold desert (Tann=7.5<18)", 0.1, 20, -5, 50, 30, _ID["BWk"]),
    ("BSh hot steppe (280<=400<560)", 0.1, 32, 10, 250, 150, _ID["BSh"]),
    ("BSk cold steppe (170<=250<340)", 0.1, 22, -2, 150, 100, _ID["BSk"]),
    ("Csa Mediterranean NH", 0.1, 25, 8, 60, 500, _ID["Csa"]),
    # SH cell: local summer is SIM WINTER — dry local summer must still
    # read Mediterranean (the hemisphere-flip the reference guards against)
    ("Csb Mediterranean SH flip", 0.1, 8, 20, 500, 60, _ID["Csb"]),
    ("Cfa humid subtropical", 0.1, 26, 5, 550, 450, _ID["Cfa"]),
    ("Cfb oceanic", 0.1, 18, 5, 500, 450, _ID["Cfb"]),
    ("Cfc subpolar oceanic (Tshoulder=8.67<10)", 0.1, 12, 2, 400, 380,
     _ID["Cfc"]),
    ("Cwa monsoon subtropical NH (PwM=6.7<15)", 0.1, 28, 5, 900, 40,
     _ID["Cwa"]),
    ("Cwa monsoon subtropical SH flip", 0.1, 5, 28, 40, 900, _ID["Cwa"]),
    ("Dfa hot-summer continental", 0.1, 24, -8, 400, 300, _ID["Dfa"]),
    ("Dfb warm-summer (Tshoulder=11>=10)", 0.1, 21, -9, 400, 300,
     _ID["Dfb"]),
    ("Dfc subarctic (Tshoulder=2.67<10)", 0.1, 14, -20, 300, 200,
     _ID["Dfc"]),
    ("Dfd extreme subarctic (Tcold=-45<-38)", 0.1, 13, -45, 300, 200,
     _ID["Dfd"]),
    ("Dsb dry-summer continental", 0.1, 20.5, -5, 40, 400, _ID["Dsb"]),
    ("Dwd monsoon extreme (PwM=3.3<5.83)", 0.1, 16, -44, 350, 20,
     _ID["Dwd"]),
]


def test_koppen_reference_truth_table():
    elev = jnp.asarray([r[1] for r in KOPPEN_ROWS], jnp.float32)
    ts = jnp.asarray([_tn(r[2]) for r in KOPPEN_ROWS], jnp.float32)
    tw = jnp.asarray([_tn(r[3]) for r in KOPPEN_ROWS], jnp.float32)
    ps = jnp.asarray([_pn(r[4]) for r in KOPPEN_ROWS], jnp.float32)
    pw = jnp.asarray([_pn(r[5]) for r in KOPPEN_ROWS], jnp.float32)
    got = np.asarray(classify_koppen(elev, ts, tw, ps, pw))
    for i, row in enumerate(KOPPEN_ROWS):
        assert got[i] == row[6], (
            f"{row[0]}: got {KOPPEN_CODES[int(got[i])]}, "
            f"expected {KOPPEN_CODES[row[6]]}")


# ── planet codes ─────────────────────────────────────────────────────────

_B36 = "0123456789abcdefghijklmnopqrstuvwxyz"


def _b36(v: int, width: int) -> str:
    out = ""
    while v > 0:
        out = _B36[v % 36] + out
        v //= 36
    return (out or "0").rjust(width, "0")


def test_planet_code_hand_packed_bigint():
    """One fully hand-packed example against js/planet-code.js:224-246.

    seed=42, N=204000, jitter=0.75, P=80, continents=4, roughness=0.3,
    warp=0.5, smoothing=0.5, glacial=0, hydraulic=0.5, thermal=0.1,
    ridge=0.35, creep=0.05, variety=0, temp=0, precip=0, land=0.3.
    Quantized indices (value−min)/step, packed MSB-first in the order
    seed,N,j,P,cn,rough,sm,gl,he,te,rs,sc,tw,csv,tmp,prc,lc with radices
    2556,21,117,10,51,21,21,21,21,21,21,21,21,31,21,101.
    """
    idx = dict(n=(204000 - 5000) // 1000, j=round(0.75 / 0.05), p=80 - 4,
               cn=4 - 1, ns=round(0.3 / 0.01), sm=round(0.5 / 0.05),
               gl=0, he=round(0.5 / 0.05), te=round(0.1 / 0.05),
               rs=round(0.35 / 0.05), sc=round(0.05 / 0.05), tw=round(0.5 / 0.05),
               csv=0, tmp=15, prc=10, lc=30)
    assert (idx["n"], idx["j"], idx["p"]) == (199, 15, 76)
    packed = 42
    for radix, i in [(2556, idx["n"]), (21, idx["j"]), (117, idx["p"]),
                     (10, idx["cn"]), (51, idx["ns"]), (21, idx["sm"]),
                     (21, idx["gl"]), (21, idx["he"]), (21, idx["te"]),
                     (21, idx["rs"]), (21, idx["sc"]), (21, idx["tw"]),
                     (21, idx["csv"]), (31, idx["tmp"]), (21, idx["prc"]),
                     (101, idx["lc"])]:
        packed = packed * radix + i
    expected = _b36(packed, 22)

    got = encode_planet_code(
        42, 204000, 0.75, 80, 4, 0.3, 0.5, 0.5, 0.0, 0.5, 0.1, 0.35, 0.05,
        0.0, 0, 0.0, 0.3)
    assert got == expected
    dec = decode_planet_code(got)
    assert dec["seed"] == 42 and dec["N"] == 204000
    assert dec["jitter"] == 0.75 and dec["P"] == 80
    assert dec["landCoverage"] == 0.3 and dec["toggledIndices"] == []

    # toggle suffix: '-' + 2-char base36 per plate index (js:241-245)
    got_t = encode_planet_code(
        42, 204000, 0.75, 80, 4, 0.3, 0.5, 0.5, 0.0, 0.5, 0.1, 0.35, 0.05,
        0.0, 0, 0.0, 0.3, [3, 41])
    assert got_t == expected + "-0315"
    assert decode_planet_code(got_t)["toggledIndices"] == [3, 41]


# Synthetic legacy codes: pack known index values with each generation's
# radix table (js/planet-code.js:37-52), then assert the decoder recovers
# the exact field values AND the per-format defaults.
LEGACY_CASES = [
    # (length, radices LSB-first, field indices LSB-first,
    #  expected fields, expected defaults)
    (13, [21, 21, 51, 10, 117, 21, 2559], [10, 8, 25, 2, 76, 15, 199],
     dict(hydraulicErosion=0.5, smoothing=0.4, roughness=0.25,
          numContinents=3, P=80, jitter=0.75, N=204000),
     dict(terrainWarp=0.5, glacialErosion=0, thermalErosion=0.1,
          ridgeSharpening=0.35, soilCreep=0.05, continentSizeVariety=0,
          temperatureOffset=0, precipitationOffset=0, landCoverage=0.3)),
    (14, [21, 21, 21, 51, 10, 117, 21, 2559], [2, 10, 8, 25, 2, 76, 15, 199],
     dict(thermalErosion=0.1, hydraulicErosion=0.5, smoothing=0.4,
          roughness=0.25, numContinents=3, P=80, jitter=0.75, N=204000),
     dict(terrainWarp=0.5, glacialErosion=0, ridgeSharpening=0.35,
          soilCreep=0.05, landCoverage=0.3)),
    (16, [21, 21, 21, 21, 21, 51, 10, 117, 21, 2559],
     [1, 7, 2, 10, 8, 25, 2, 76, 15, 199],
     dict(soilCreep=0.05, ridgeSharpening=0.35, thermalErosion=0.1,
          hydraulicErosion=0.5, smoothing=0.4, roughness=0.25,
          numContinents=3, P=80, jitter=0.75, N=204000),
     dict(terrainWarp=0.5, glacialErosion=0, landCoverage=0.3)),
    (17, [21, 21, 21, 21, 21, 21, 51, 10, 117, 21, 2559],
     [1, 7, 2, 10, 4, 8, 25, 2, 76, 15, 199],
     dict(soilCreep=0.05, ridgeSharpening=0.35, thermalErosion=0.1,
          hydraulicErosion=0.5, glacialErosion=0.2, smoothing=0.4,
          roughness=0.25, numContinents=3, P=80, jitter=0.75, N=204000),
     dict(terrainWarp=0.5, landCoverage=0.3)),
    (18, [21, 21, 21, 21, 21, 21, 21, 51, 10, 117, 21, 2556],
     [12, 1, 7, 2, 10, 4, 8, 25, 2, 76, 15, 199],
     dict(terrainWarp=0.6, soilCreep=0.05, ridgeSharpening=0.35,
          thermalErosion=0.1, hydraulicErosion=0.5, glacialErosion=0.2,
          smoothing=0.4, roughness=0.25, numContinents=3, P=80,
          jitter=0.75, N=204000),
     dict(continentSizeVariety=0, temperatureOffset=0,
          precipitationOffset=0, landCoverage=0.3)),
    (21, [21, 31, 21, 21, 21, 21, 21, 21, 21, 21, 51, 10, 117, 21, 2556],
     [12, 18, 5, 12, 1, 7, 2, 10, 4, 8, 25, 2, 76, 15, 199],
     dict(precipitationOffset=0.2, temperatureOffset=3,
          continentSizeVariety=0.25, terrainWarp=0.6, soilCreep=0.05,
          ridgeSharpening=0.35, thermalErosion=0.1, hydraulicErosion=0.5,
          glacialErosion=0.2, smoothing=0.4, roughness=0.25,
          numContinents=3, P=80, jitter=0.75, N=204000),
     dict(landCoverage=0.3)),
]


@pytest.mark.parametrize("length,radices,idxs,fields,defaults",
                         LEGACY_CASES, ids=[str(c[0]) for c in LEGACY_CASES])
def test_planet_code_legacy_formats(length, radices, idxs, fields, defaults):
    seed = 123456
    packed = seed
    for radix, i in zip(reversed(radices), reversed(idxs)):
        assert i < radix
        packed = packed * radix + i
    code = _b36(packed, length)
    assert len(code) == length, (
        f"synthetic {length}-char example overflowed to {len(code)} chars")
    dec = decode_planet_code(code)
    assert dec is not None, f"decoder rejected valid {length}-char code"
    assert dec["seed"] == seed
    for k, v in fields.items():
        assert dec[k] == pytest.approx(v), (length, k, dec[k], v)
    for k, v in defaults.items():
        assert dec[k] == pytest.approx(v), (length, "default", k, dec[k], v)


def test_planet_code_rejects_invalid():
    assert decode_planet_code("not a code!") is None
    assert decode_planet_code("0" * 15) is None       # no 15-char format
    # out-of-range quantized index must be rejected (idx >= count → null):
    # legacy radix 2559 > N count 2556, so pack N index 2557
    packed = 0
    for radix, i in zip(reversed([21, 21, 51, 10, 117, 21, 2559]),
                        reversed([10, 8, 25, 2, 76, 15, 2557])):
        packed = packed * radix + i
    assert decode_planet_code(_b36(packed, 13)) is None
    # toggle index >= P is invalid
    good = encode_planet_code(1, 5000, 0.5, 10, 2, 0.2, 0.5, 0.5, 0, 0.5,
                              0.1, 0.35, 0.05, 0, 0, 0, 0.3)
    assert decode_planet_code(good + "-0b") is None   # 11 >= P=10


# ── heightmap import curve (js/planet-worker.js:705-708) ────────────────

def test_import_grayscale_curve_goldens():
    from planet_heightmap_generation_tpu.pipeline.engine import (
        _grayscale_to_elevation)
    gray = jnp.asarray([0.0, 0.5, 1.0, 2.0, 64.5, 128.0, 255.0], jnp.float32)
    got = np.asarray(_grayscale_to_elevation(gray))
    exp = [(-0.5 if v < 1 else math.sqrt((v - 1) / 254.0))
           for v in [0.0, 0.5, 1.0, 2.0, 64.5, 128.0, 255.0]]
    np.testing.assert_allclose(got, exp, atol=1e-6)
    # the curve inverts the renderer's 6·t² height mapping: full white is
    # exactly t=1
    assert got[-1] == pytest.approx(1.0)


# ── Round-4 tranche: wind/climate curve goldens (VERDICT r3 #9) ──────────────
# ITCZ latitude formula (js/wind.js:174-232), periodic-spline solver
# (js/wind.js:12-71), pressure field (js/wind.js:239-301), zonal precip base
# curve (js/heuristic-precip.js:16-37). Literals hand-evaluated from the
# reference source; the device kernels must reproduce them.

DEG = math.pi / 180.0


def _uniform_bins(land_frac, elev, n_lat=36, n_lon=72):
    """Synthetic geo-bin aggregates: every bin has count 1, the given land
    fraction and elevation sum — spatially uniform, so the ITCZ sampling /
    smoothing stages are exact no-ops and the zonal formula shows through."""
    nb = n_lat * n_lon
    cnt = jnp.ones(nb, jnp.float32)
    land = jnp.full(nb, land_frac, jnp.float32)
    esum = jnp.full(nb, elev, jnp.float32)
    return cnt, land, esum


@pytest.mark.parametrize("land,elev,expect_deg", [
    (0.0, 0.0, 5.0),       # all ocean → the 5° default
    (1.0, 0.0, 20.0),      # full land pull: 5 + 15, clamp no-op
    (0.25, 0.0, 12.5),     # landPull = min(1, 0.25*2) = 0.5 → 5 + 7.5
    # elevToHeightKm(0.5) = 6·0.5⁴·(5−4·0.5) = 1.125 km → −1.6875°
    (0.25, 0.5, 10.8125),
    (1.0, 1.0, 11.0),      # 5 + 15 − 6·1.5 = 11  (elev 1.0 → 6 km)
])
def test_itcz_latitude_formula(land, elev, expect_deg):
    """itczDeg = 5 + min(1, 2·landFrac)·15 − elevKm·1.5, clamped [5, 20]
    (js/wind.js:195-207), checked on uniform fields for both seasons."""
    from planet_heightmap_generation_tpu.climate.wind import _itcz_latitudes

    cnt, land_a, esum = _uniform_bins(land, elev)
    for sign in (1.0, -1.0):
        lats = np.asarray(_itcz_latitudes(cnt, land_a, esum, sign))
        np.testing.assert_allclose(lats, expect_deg * sign * DEG,
                                   rtol=0, atol=1e-4)


def test_periodic_spline_matches_reference_solver():
    """Device Gauss-Seidel periodic spline (20 sweeps) vs an independent
    numpy transcription of js/wind.js:12-71, at knots and midpoints."""
    from planet_heightmap_generation_tpu.climate.wind import (
        _build_periodic_spline, eval_spline, _ITCZ_LONS, NUM_ITCZ_LON)

    n = NUM_ITCZ_LON
    lons = np.asarray(_ITCZ_LONS, np.float64)
    ys = (12.0 + 4.0 * np.sin(2 * lons) + 2.0 * np.cos(5 * lons)) * DEG

    # reference solver, transcribed: h uniform, alpha_i = 3/h·(y[i+1]-y[i])
    # − 3/h·(y[i]-y[i-1]); 20 Gauss-Seidel sweeps of
    # c[i] = (alpha[i] − h·c[i-1] − h·c[i+1]) / (4h);  b, d from c.
    h = 2 * np.pi / n
    alpha = (3 / h) * (np.roll(ys, -1) - ys) - (3 / h) * (ys - np.roll(ys, 1))
    c = np.zeros(n)
    for _ in range(20):
        for i in range(n):
            c[i] = (alpha[i] - h * c[(i - 1) % n] - h * c[(i + 1) % n]) / (4 * h)
    b = (np.roll(ys, -1) - ys) / h - h * (np.roll(c, -1) + 2 * c) / 3
    d = (np.roll(c, -1) - c) / (3 * h)

    sp = _build_periodic_spline(jnp.asarray(ys, jnp.float32))
    # knots reproduce ys exactly; midpoints match the numpy transcription
    got_knots = np.asarray(eval_spline(sp, jnp.asarray(lons, jnp.float32)))
    np.testing.assert_allclose(got_knots, ys, rtol=0, atol=5e-5)
    mid = lons + h / 2
    want_mid = ys + b * (h / 2) + c * (h / 2) ** 2 + d * (h / 2) ** 3
    got_mid = np.asarray(eval_spline(sp, jnp.asarray(mid, jnp.float32)))
    np.testing.assert_allclose(got_mid, want_mid, rtol=0, atol=5e-4)


# (lat°, continentality, elevation, season, expected hPa) — hand-evaluated
# from js/wind.js:239-301 with a FLAT ITCZ spline at ±5° (summer +5, winter
# −5) and the noise term excluded (subtracted exactly in the test):
#   45N ocean summer:  1013 − 15e^{−12.5} + 12e^{−0.5} − 10e^{−1.125}
#                      + 8e^{−12.5}                      = 1017.031817
#   60N cont=1 elev=.5 winter: 1013 + 8.4e^{−6.125} − 10 + 8e^{−4.8828125}
#                      + 14 − 3·1.125                    = 1013.703981
#   30S cont=.35 summer: 1013 − 15e^{−9.5703125} + 10.74e^{−0.125}
#                      − 10e^{−4.5} + 14·0.75·0.5        = 1027.615880
PRESSURE_ROWS = [
    (45.0, 0.0, 0.0, "summer", 1017.031817),
    (60.0, 1.0, 0.5, "winter", 1013.703981),
    (-30.0, 0.35, 0.0, "summer", 1027.615880),
]


@pytest.mark.parametrize("lat,cont,elev,season,expect", PRESSURE_ROWS)
def test_pressure_field_goldens(lat, cont, elev, season, expect):
    from planet_heightmap_generation_tpu.climate.util import geo_frame
    from planet_heightmap_generation_tpu.climate.wind import (
        _build_periodic_spline, _pressure_kernel, NUM_ITCZ_LON)
    from planet_heightmap_generation_tpu.ops.noise import tables, fbm

    is_summer = season == "summer"
    itcz_deg = 5.0 if is_summer else -5.0
    sp = _build_periodic_spline(
        jnp.full(NUM_ITCZ_LON, itcz_deg * DEG, jnp.float32))

    # Y-up convention (js/wind.js:418-443): lat from y, lon = atan2(x, z)
    lat_r, lon_r = lat * DEG, 0.3
    pos = jnp.asarray([[math.cos(lat_r) * math.sin(lon_r),
                        math.sin(lat_r),
                        math.cos(lat_r) * math.cos(lon_r)]], jnp.float32)
    gf = geo_frame(pos)
    t = tables(3.0)
    p = _pressure_kernel(pos, gf, sp, jnp.asarray([cont], jnp.float32),
                         jnp.asarray([elev], jnp.float32), t, is_summer)
    noise = np.asarray(
        fbm(t, pos[:, 0] * 2, pos[:, 1] * 2, pos[:, 2] * 2, 3)) * 2
    got = float(np.asarray(p)[0] - noise[0])
    # f32 accumulation at ~1013 hPa: eps ≈ 6e-5·1013 per op
    assert abs(got - expect) < 5e-3, (got, expect)


# distDeg → zonalBase, hand-evaluated from js/heuristic-precip.js:16-37
# (smoothstep(a,b,x) = t²(3−2t)):
ZONAL_ROWS = [
    (0.0, 1.0), (4.9, 1.0),
    (7.5, 0.675),            # 1 − 0.65·ss(5,10,7.5)=1−0.65·0.5
    (10.0, 0.35),
    (19.0, 0.185),           # 0.35 − 0.33·0.5
    (28.0, 0.02), (30.0, 0.02),
    (44.0, 0.26),            # 0.02 + 0.48·0.5
    (55.0, 0.5),
    (62.5, 0.4),             # 0.5 − 0.2·0.5
    (70.0, 0.3),
    (80.0, 0.2),             # 0.3 − 0.2·0.5
    (90.0, 0.1),
]


def test_zonal_base_curve_goldens():
    from planet_heightmap_generation_tpu.climate.heuristic_precip import (
        zonal_base)

    d = jnp.asarray([r[0] for r in ZONAL_ROWS], jnp.float32)
    want = np.asarray([r[1] for r in ZONAL_ROWS], np.float32)
    got = np.asarray(zonal_base(d))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


# ── tranche 3: elevation / erosion formula goldens (VERDICT r4 #8) ──────
# Hand-evaluated in float64 against the reference source; the repo runs
# float32, so tolerances are a few ULP above f32 rounding. These fail if
# any constant or breakpoint in the curves drifts.

def test_base_blend_goldens():
    """Harmonic-mean base blend, js/elevation.js:638-655: values computed
    by hand with eps=1e-3, BASE_SCALE=0.6, asym = 1+(sf-0.5)*0.8."""
    from planet_heightmap_generation_tpu.elevation.assemble import base_blend

    inf = np.inf
    rows = [
        # (d_mtn, d_ocean, d_coastline, sf, expected)
        (2.0, 8.0, 4.0, 0.5, 0.25707858979018045),
        (2.0, 8.0, 4.0, 0.9, 0.20196767871332036),   # subducting: lower
        (2.0, 8.0, 4.0, 0.1, 0.3297014360208033),    # overriding: higher
        (inf, 3.0, 5.0, 0.5, -0.3749812546863284),   # ocean-only field
        (3.0, inf, 5.0, 0.5, 0.3749812546863284),    # mountain-only field
        (inf, inf, 5.0, 0.5, 0.06),                  # no field → 0.1·0.6
    ]
    dm, do, dc, sf, want = (np.array(c, np.float32) for c in zip(*rows))
    got = np.asarray(base_blend(jnp.asarray(dm), jnp.asarray(do),
                                jnp.asarray(dc), jnp.asarray(sf)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_ocean_floor_profile_goldens():
    """Shelf/slope/abyss breakpoints at 5/12 hops, js/elevation.js:896-909."""
    from planet_heightmap_generation_tpu.elevation.assemble import (
        ocean_floor_profile)

    rows = [
        # (dist_coast, abyss_noise, expected)
        (0.0, 0.02, -0.04),             # coastline
        (2.5, 0.02, -0.07),             # mid-shelf: -0.04 - 0.06·0.5
        (4.999, 0.02, -0.099988),       # shelf end approaches -0.10
        (5.0, 0.02, -0.10),             # slope start (second branch at 0)
        (8.5, 0.02, -0.225),            # mid-slope: -0.10 - 0.25·0.5
        (12.0, 0.02, -0.33),            # abyss: -0.35 + noise
        (100.0, -0.01, -0.36),          # abyss with negative noise
    ]
    dc, nz, want = (np.array(c, np.float32) for c in zip(*rows))
    got = np.asarray(ocean_floor_profile(jnp.asarray(dc), jnp.asarray(nz)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def _chain_graph():
    """2 → 1 → 0 → ocean(3): the 3-cell drainage chain of
    js/terrain-post.js:614-641, expressed directly in receiver arrays."""
    elev = jnp.asarray(np.array([0.1, 0.3, 0.6, -0.2], np.float32))
    is_ocean = jnp.asarray(np.array([0, 0, 0, 1], bool))
    valid = jnp.ones(4, bool)
    rcv = jnp.asarray(np.array([3, 0, 1, -1], np.int32))
    dist = jnp.ones(4, jnp.float32)
    is_pit = jnp.zeros(4, bool)
    return elev, is_ocean, valid, rcv, dist, is_pit


def test_flow_accumulation_chain_golden():
    from planet_heightmap_generation_tpu.erosion.fluvial import (
        flow_accumulation)

    _, is_ocean, valid, rcv, _, is_pit = _chain_graph()
    land = (~is_ocean) & valid
    flow = np.asarray(flow_accumulation(land, rcv, is_pit))
    # the reference's accumulation pass adds into OCEAN targets too
    # (js/terrain-post.js:609-612 has no ocean guard), so the sink cell
    # reads the full upstream count; only land consumers use it
    np.testing.assert_array_equal(flow, [3.0, 2.0, 1.0, 3.0])


def test_stream_power_chain_golden():
    """Implicit stream-power + sediment deposition on the 3-cell chain,
    hand-evaluated sequentially in float64 per js/terrain-post.js:614-638
    (K=0.1, m=0.5, dt=1): factors K·√flow, h' = (h + F·h'_rcv)/(1+F),
    deposit = eroded · 0.5/(1+slope·50) at the receiver. The parallel
    solve is exact; the deposit pass reads post-solve (not mid-sweep)
    receiver slopes, a documented approximation worth < 1e-5 here."""
    from planet_heightmap_generation_tpu.erosion.fluvial import (
        stream_power_solve)

    elev, is_ocean, valid, rcv, dist, is_pit = _chain_graph()
    flow = jnp.asarray(np.array([3.0, 2.0, 1.0, 0.0], np.float32))
    got = np.asarray(stream_power_solve(
        elev, is_ocean, valid, rcv, dist, is_pit, flow,
        k_coeff=0.1, m_exp=0.5, dt=1.0))
    want = [0.08610834, 0.27482338, 0.57030827, -0.2]
    np.testing.assert_allclose(got, want, atol=3e-5)


def _line_graph(n=8):
    """1-D line mesh (i ↔ i±1) in banded form: band_off=(-1, +1)."""
    band_off = (-1, 1)
    band_mask = np.zeros((n, 2), bool)
    band_mask[1:, 0] = True     # neighbor i-1
    band_mask[:-1, 1] = True    # neighbor i+1
    band_dist = band_mask.astype(np.float32)
    rem_src = jnp.asarray(np.array([n], np.int32))     # no remainder edges
    rem_dst = jnp.asarray(np.array([0], np.int32))
    rem_dist = jnp.asarray(np.array([0.0], np.float32))
    return (band_off, jnp.asarray(band_mask), jnp.asarray(band_dist),
            rem_src, rem_dst, rem_dist)


def test_thermal_talus_goldens():
    """Talus excess distribution, js/terrain-post.js:644-686: a single
    peak sheds k·total·0.5, split across steep edges by excess share."""
    from planet_heightmap_generation_tpu.erosion.thermal import thermal_step

    band_off, band_mask, band_dist, rem_src, rem_dst, rem_dist = _line_graph()
    n = 8
    valid = jnp.ones(n, bool)
    elev = np.zeros(n, np.float32)
    elev[1] = 0.5
    # both-neighbor case: slopes 0.5 > talus 0.3 → excess 0.2+0.2,
    # transfer = 0.5·0.4·0.5 = 0.1, split evenly
    got = np.asarray(thermal_step(
        jnp.asarray(elev), jnp.zeros(n, bool), valid, band_off, band_mask,
        jnp.asarray(band_dist), rem_src, rem_dst, rem_dist,
        jnp.float32(0.3), jnp.float32(0.5)))
    want = np.zeros(n, np.float32)
    want[0], want[1], want[2] = 0.05, 0.4, 0.05
    np.testing.assert_allclose(got, want, atol=1e-6)

    # ocean neighbors are excluded from both shed and receive
    # (js/terrain-post.js:656: `if (r_isOcean[nb]) continue`)
    is_ocean = np.zeros(n, bool)
    is_ocean[0] = True
    got = np.asarray(thermal_step(
        jnp.asarray(elev), jnp.asarray(is_ocean), valid, band_off, band_mask,
        jnp.asarray(band_dist), rem_src, rem_dst, rem_dist,
        jnp.float32(0.3), jnp.float32(0.5)))
    want = np.zeros(n, np.float32)
    want[1], want[2] = 0.45, 0.05
    np.testing.assert_allclose(got, want, atol=1e-6)

    # sub-talus slopes shed nothing
    gentle = np.linspace(0.0, 0.2, n).astype(np.float32)
    got = np.asarray(thermal_step(
        jnp.asarray(gentle), jnp.zeros(n, bool), valid, band_off, band_mask,
        jnp.asarray(band_dist), rem_src, rem_dst, rem_dist,
        jnp.float32(0.3), jnp.float32(0.5)))
    np.testing.assert_allclose(got, gentle, atol=1e-7)


# ── tranche 4: smoothing / sharpening / creep goldens ──────────────────

def test_smooth_elevation_goldens():
    """Bilateral smoothing, js/terrain-post.js:317-354: weight
    1/(1+8|Δh|), coastline-LAND cells locked, ocean cells still movable."""
    from planet_heightmap_generation_tpu.erosion.smooth import (
        smooth_elevation)

    band_off, band_mask, _, rem_src, rem_dst, _ = _line_graph()
    n = 8
    valid = jnp.ones(n, bool)
    elev = np.zeros(n, np.float32)
    elev[1] = 0.5
    # all land: peak pulls toward neighbor average with bilateral weights
    got = np.asarray(smooth_elevation(
        jnp.asarray(elev), jnp.zeros(n, bool), valid, band_off, band_mask,
        rem_src, rem_dst, 1, jnp.float32(0.4)))
    want = np.zeros(n, np.float32)
    # line END (cell 0) sees only the peak: w=0.2, avg=0.5 → 0.5·0.4
    want[0] = 0.2
    # peak: both neighbors 0 → avg 0 → 0.5 − 0.5·0.4
    want[1] = 0.3
    # cell 2 has TWO neighbors: w(peak)=0.2, w(zero)=1 → avg 0.1/1.2
    want[2] = (0.1 / 1.2) * 0.4
    np.testing.assert_allclose(got, want, atol=1e-6)

    # ocean neighbor: land cell 1 is coastline-locked; the OCEAN cell 0
    # itself still smooths (the reference locks only land)
    elev2 = np.zeros(n, np.float32)
    elev2[0], elev2[1] = -0.1, 0.5
    is_ocean = np.zeros(n, bool)
    is_ocean[0] = True
    got = np.asarray(smooth_elevation(
        jnp.asarray(elev2), jnp.asarray(is_ocean), valid, band_off,
        band_mask, rem_src, rem_dst, 1, jnp.float32(0.4)))
    want = np.zeros(n, np.float32)
    want[0] = -0.1 + (0.5 - (-0.1)) * 0.4          # 0.14
    want[1] = 0.5                                   # locked
    # cell 2: w(peak)=0.2, w(zero nbr)=1.0 → avg 0.1/1.2
    want[2] = (0.1 / 1.2) * 0.4
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_sharpen_ridges_goldens():
    """Ridge sharpening, js/terrain-post.js:713-751: above-average land
    cells push away from the mean, capped at 1.5x the ORIGINAL height."""
    from planet_heightmap_generation_tpu.erosion.smooth import sharpen_ridges

    band_off, band_mask, _, rem_src, rem_dst, _ = _line_graph()
    n = 8
    valid = jnp.ones(n, bool)
    elev = np.zeros(n, np.float32)
    elev[1] = 0.5
    got = np.asarray(sharpen_ridges(
        jnp.asarray(elev), jnp.zeros(n, bool), valid, band_off, band_mask,
        rem_src, rem_dst, 1, jnp.float32(0.5)))
    want = np.zeros(n, np.float32)
    want[1] = 0.75          # 0.5 + 0.5·0.5, exactly at the 1.5x cap
    np.testing.assert_allclose(got, want, atol=1e-6)

    # stronger push hits the cap
    got = np.asarray(sharpen_ridges(
        jnp.asarray(elev), jnp.zeros(n, bool), valid, band_off, band_mask,
        rem_src, rem_dst, 1, jnp.float32(0.8)))
    assert abs(float(got[1]) - 0.75) < 1e-6         # capped, not 0.9


def test_soil_creep_goldens():
    """Soil creep, js/terrain-post.js:758-794: plain Laplacian toward the
    LAND-neighbor average, interior land only (coastline locked)."""
    from planet_heightmap_generation_tpu.erosion.smooth import (
        apply_soil_creep)

    band_off, band_mask, _, rem_src, rem_dst, _ = _line_graph()
    n = 8
    valid = jnp.ones(n, bool)
    elev = np.zeros(n, np.float32)
    elev[0], elev[1] = -0.1, 0.5
    is_ocean = np.zeros(n, bool)
    is_ocean[0] = True
    got = np.asarray(apply_soil_creep(
        jnp.asarray(elev), jnp.asarray(is_ocean), valid, band_off,
        band_mask, rem_src, rem_dst, 1, jnp.float32(0.1125)))
    want = elev.copy()
    # cell 1 is coastal-locked, cell 0 is ocean (untouched); cell 2's
    # land-neighbor average is (0.5 + 0)/2
    want[2] = 0.0 + (0.25 - 0.0) * 0.1125
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_glaciation_index_goldens():
    """Latitude/elevation glaciation index, js/terrain-post.js:410-428:
    smoothstep(polar, thresholdLat, 90°) vs 0.3·elevFactor·(0.3+0.7·
    latScale), times strength, land only; the reference reads the Y axis
    as the pole axis. Expected values hand-evaluated in float64."""
    from planet_heightmap_generation_tpu.erosion.glacial import (
        glaciation_index)

    s60, s80 = math.sin(math.pi / 3), math.sin(80 * math.pi / 180)
    rows = [
        # (y, elev, strength, is_ocean, expected)
        (1.0, 0.3, 1.0, False, 1.0),            # pole: latFactor 1
        (s60, 0.7, 1.0, False, 0.15625),        # 60°: lat t=0.25 wins
        (0.0, 1.0, 1.0, False, 0.09),           # equator: elevation path
        (s80, 0.2, 0.5, False, 0.25),           # strength moves threshold
        (0.5, 0.6, 0.8, False, 0.01398),        # 30°: scaled elev path
        (1.0, 0.3, 1.0, True, 0.0),             # ocean masked
    ]
    y = np.array([r[0] for r in rows], np.float32)
    pos = np.stack([np.sqrt(np.maximum(0, 1 - y * y)), y,
                    np.zeros_like(y)], axis=1)
    elev = jnp.asarray([r[1] for r in rows], jnp.float32)
    oc = jnp.asarray([r[3] for r in rows])
    valid = jnp.ones(len(rows), bool)
    for s in sorted({r[2] for r in rows}):
        idx = [i for i, r in enumerate(rows) if r[2] == s]
        got = np.asarray(glaciation_index(
            jnp.asarray(pos), elev, oc, valid, jnp.float32(s)))
        for i in idx:
            assert abs(got[i] - rows[i][4]) < 2e-6, (i, got[i], rows[i][4])


def test_temperature_kernel_goldens():
    """Per-cell temperature contract, js/temperature.js:100-210: two-curve
    ITCZ/flat base blend (28 − 47·t^1.4 beyond the 13° tropical plateau),
    moisture lapse 4.5+4.8·(1−p) °C/km on elevToHeightKm, ocean SST shift
    warmth·min(1,2·speed)·16, coastal diffused warmth ×(1−smoothstep(0,
    0.95,pCont))·20, cloud moderation ±15%, and the maritime/continental
    seasonal swing (deviation + ±12°·latitude boost, ×(0.50+0.70·cont)).
    Expected values hand-evaluated in float64 from the reference formula
    with a flat ITCZ at 0° (itcz_lats = zeros)."""
    from planet_heightmap_generation_tpu.climate.temperature import (
        _temperature_kernel)

    DEG = math.pi / 180
    itcz0 = jnp.zeros(72, jnp.float32)

    # (lat°, elev, land, cont, p_cont, warmth, speed, precip, cw, off, expect)
    summer_rows = [
        # equator ocean: both curves on the tropical plateau, zero swing
        (0.0, -0.5, False, 0.0, 0.0, 0.0, 0.0, 0.5, 0.0, 0.0, 28.0),
        # warm current +8 °C SST, halved by the maritime factor at cont=0
        (0.0, -0.5, False, 0.0, 0.0, 1.0, 0.25, 0.5, 0.0, 0.0, 32.0),
        # dry mountain: lapse 9.3·1.125 km, clear-sky ×1.15, interior ×1.2
        (0.0, 0.5, True, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 20.69425),
        # 45°N land summer: +12°·smoothstep(10,55,45) boost ×1.2
        (45.0, 0.0, True, 1.0, 0.0, 0.0, 0.0, 0.4, 0.0, 0.0, 26.83531),
        # 65°S in sim-summer = LOCAL winter: boost sign flips
        (-65.0, 0.0, True, 1.0, 0.0, 0.0, 0.0, 0.4, 0.0, 0.0, -15.38977),
        # heavy cloud moderates toward zero (×(1−0.896·0.15))
        (0.0, -0.5, False, 0.0, 0.0, 0.0, 0.0, 0.9, 0.0, 0.0, 26.11840),
        # coastal land warmed by diffused ocean warmth, faded by pCont
        (30.0, 0.1, True, 0.2, 0.3, 0.0, 0.0, 0.5, 0.8, 0.0, 33.33431),
        # temperatureOffset is a plain final add (after the swing)
        (0.0, -0.5, False, 0.0, 0.0, 0.0, 0.0, 0.5, 0.0, 3.0, 31.0),
    ]
    # winter season: the flat reference curve sits at −5°, local summer
    # flips hemisphere (60°N in winter gets the −boost)
    winter_rows = [
        (60.0, -0.5, False, 0.0, 0.0, 0.0, 0.0, 0.4, 0.0, 0.0, -2.01176),
    ]
    for rows, is_summer in ((summer_rows, True), (winter_rows, False)):
        lat = jnp.asarray([r[0] * DEG for r in rows], jnp.float32)
        lon = jnp.zeros(len(rows), jnp.float32)
        got = np.asarray(_temperature_kernel(
            lat, lon,
            jnp.asarray([r[1] for r in rows], jnp.float32),
            jnp.asarray([r[2] for r in rows]),
            jnp.asarray([r[3] for r in rows], jnp.float32),
            jnp.asarray([r[4] for r in rows], jnp.float32),
            itcz0,
            jnp.asarray([r[5] for r in rows], jnp.float32),
            jnp.asarray([r[6] for r in rows], jnp.float32),
            jnp.asarray([r[7] for r in rows], jnp.float32),
            jnp.asarray([r[8] for r in rows], jnp.float32),
            jnp.asarray([r[9] for r in rows], jnp.float32),
            is_summer=is_summer))
        want = np.array([r[10] for r in rows], np.float64)
        np.testing.assert_allclose(got, want, atol=2e-3)


def test_stress_propagation_goldens():
    """Stress BFS contract, js/elevation.js:127-159 via the production
    banded sweep (propagate_stress_banded ≡ propagate_stress_multi, see
    test_banded.py): per hop the strongest same-plate neighbor's stress
    decays by `decay` (or `subduct_decay` when the SOURCE's subduct factor
    >0.5 — the factor rides along with the front), propagation stops below
    the 0.005 cutoff and never leaves ocean-plate cells. The caller derives
    decay = (0.5+spread·0.04)^(1/√(N/10⁴)) and subduct_decay from
    baseDecay·0.45 (js/elevation.js:330-335 ≙ assemble.py:548-551); here
    the hop mechanism itself is pinned on a 1-D line mesh."""
    from planet_heightmap_generation_tpu.ops.banded import (
        propagate_stress_banded, band_gate, rem_gate_eq)

    band_off, band_mask, _, rem_src, rem_dst, _ = _line_graph()
    n = 8

    def run(stress0, sf0, r_plate, plate_ocean, decay, sub, passes):
        rp = jnp.asarray(r_plate, jnp.int32)
        gate = band_gate(rp, band_off, band_mask)
        rgate = rem_gate_eq(rp, rem_src, rem_dst)
        oc = jnp.asarray(plate_ocean)[rp]
        st, sf = propagate_stress_banded(
            jnp.asarray(stress0, jnp.float32)[:, None],
            jnp.asarray(sf0, jnp.float32)[:, None],
            (gate,), rgate[:, None], oc[:, None],
            band_off, band_mask, rem_src, rem_dst, decay, sub, passes)
        return np.asarray(st[:, 0]), np.asarray(sf[:, 0])

    one_plate = np.zeros(n, np.int32)

    # chain decay at the subducting rate: seed sf=0.6>0.5 rides along, so
    # every hop uses subduct_decay 0.5; 4 passes reach exactly cell 4
    s0 = np.zeros(n, np.float32); s0[0] = 1.0
    f0 = np.full(n, 0.2, np.float32); f0[0] = 0.6
    st, sf = run(s0, f0, one_plate, [False], 0.8, 0.5, 4)
    np.testing.assert_allclose(
        st, [1.0, 0.5, 0.25, 0.125, 0.0625, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(sf[:5], [0.6] * 5, atol=1e-6)
    np.testing.assert_allclose(sf[5:], [0.2] * 3, atol=1e-6)

    # non-subducting seed uses the plain decay
    f0 = np.full(n, 0.2, np.float32)
    st, _ = run(s0, f0, one_plate, [False], 0.8, 0.5, 3)
    np.testing.assert_allclose(
        st, [1.0, 0.8, 0.64, 0.512, 0, 0, 0, 0], atol=1e-6)

    # the 0.005 cutoff: prop 0.011·0.4 = 0.0044 never sends...
    s0 = np.zeros(n, np.float32); s0[0] = 0.011
    st, _ = run(s0, f0, one_plate, [False], 0.4, 0.2, 3)
    np.testing.assert_allclose(st, s0, atol=1e-7)
    # ...while 0.011·0.5 = 0.0055 still does
    st, _ = run(s0, f0, one_plate, [False], 0.5, 0.2, 3)
    assert abs(st[1] - 0.0055) < 1e-6

    # ocean-plate cells never propagate (js/elevation.js "never starts
    # from ocean-plate cells")
    s0 = np.zeros(n, np.float32); s0[0] = 1.0
    st, _ = run(s0, f0, one_plate, [True], 0.8, 0.5, 4)
    np.testing.assert_allclose(st, s0, atol=1e-7)

    # propagation is same-plate only: a 4|4 split stops at the boundary
    rp = np.array([0, 0, 0, 0, 1, 1, 1, 1], np.int32)
    s0 = np.zeros(n, np.float32); s0[3] = 1.0
    st, _ = run(s0, f0, rp, [False, False], 0.8, 0.5, 5)
    np.testing.assert_allclose(
        st, [0.512, 0.64, 0.8, 1.0, 0, 0, 0, 0], atol=1e-6)


def test_pressure_to_wind_goldens():
    """PGF → surface-wind rotation, js/wind.js:343-378: deflection
    70°·smoothstep(0,sin5°,|sinLat|) minus a fixed 20° friction turn,
    clockwise in the NH (negative angle), counterclockwise in the SH,
    speed ×0.6. Expected values hand-evaluated in float64 for a unit
    eastward PGF (grad_e = −1)."""
    from planet_heightmap_generation_tpu.climate.wind import (
        _pressure_to_wind)

    sin5 = math.sin(5 * math.pi / 180)
    rows = [
        # (sin_lat, expect_we, expect_wn)
        # equator: geo 0° − friction 20°, NH sign → rotate +20° CCW
        (0.0, 0.6 * math.cos(20 * math.pi / 180),
         0.6 * math.sin(20 * math.pi / 180)),
        # NH beyond 5°: full 70° − 20° = 50° clockwise
        (0.5, 0.6 * math.cos(50 * math.pi / 180),
         -0.6 * math.sin(50 * math.pi / 180)),
        # SH mirror: 50° counterclockwise
        (-0.5, 0.6 * math.cos(50 * math.pi / 180),
         0.6 * math.sin(50 * math.pi / 180)),
        # halfway up the smoothstep: t=0.5 → 3t²−2t³ = 0.5 → geo 35°
        (sin5 * 0.5, 0.6 * math.cos(15 * math.pi / 180),
         -0.6 * math.sin(15 * math.pi / 180)),
    ]
    we, wn, speed = _pressure_to_wind(
        jnp.full(len(rows), -1.0, jnp.float32),
        jnp.zeros(len(rows), jnp.float32),
        jnp.asarray([r[0] for r in rows], jnp.float32))
    np.testing.assert_allclose(we, [r[1] for r in rows], atol=2e-6)
    np.testing.assert_allclose(wn, [r[2] for r in rows], atol=2e-6)
    # unit PGF → speed is exactly the 0.6 friction factor everywhere
    np.testing.assert_allclose(speed, [0.6] * len(rows), atol=2e-6)


def test_heuristic_wind_belt_goldens():
    """Idealized wind belts vs ITCZ distance, js/heuristic-precip.js:51-81:
    ITCZ calm band (equatorward 0.1), trades ramp smoothstep(5,15)·
    (1−smoothstep(25,32)) at −0.8 E / −0.3 N·hemi, westerlies
    smoothstep(30,40)·(1−smoothstep(55,65)) at +0.9 E / +0.25 N·hemi,
    polar easterlies smoothstep(60,70) at −0.4 E / −0.15 N·hemi.
    Expected values hand-evaluated in float64."""
    from planet_heightmap_generation_tpu.climate.heuristic_precip import (
        heuristic_wind)

    rows = [
        # (dist°, hemi, we, wn)
        (0.0, 1.0, 0.0, -0.1),               # ITCZ calm, equatorward
        (3.0, -1.0, 0.0, 0.1),               # SH mirror
        (10.0, 1.0, -0.4, -0.15),            # trade ramp half strength
        (18.0, 1.0, -0.8, -0.3),             # trade peak
        (28.0, 1.0, -0.48513, -0.18192),     # trade fade: 1−ss(25,32,28)
        (35.0, 1.0, 0.45, 0.125),            # westerly ramp half
        (47.5, 1.0, 0.9, 0.25),              # westerly peak, poleward N
        (47.5, -1.0, 0.9, -0.25),            # SH westerly: poleward = south
        (65.0, 1.0, -0.2, -0.075),           # polar ramp half
        (75.0, 1.0, -0.4, -0.15),            # polar easterly full
    ]
    we, wn = heuristic_wind(
        jnp.asarray([r[0] for r in rows], jnp.float32),
        jnp.asarray([r[1] for r in rows], jnp.float32))
    np.testing.assert_allclose(we, [r[2] for r in rows], atol=2e-5)
    np.testing.assert_allclose(wn, [r[3] for r in rows], atol=2e-5)
