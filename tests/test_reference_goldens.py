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
