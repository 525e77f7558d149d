"""Planet-code tests: round-trips for all format generations, toggles,
invalid input rejection (reference js/planet-code.js)."""

import pytest

from planet_heightmap_generation_tpu.api import (
    encode_planet_code, decode_planet_code,
)

DEFAULTS = dict(
    seed=123456, N=204000, jitter=0.75, P=80, numContinents=4,
    roughness=0.25, terrainWarp=0.5, smoothing=0.3, glacialErosion=0.0,
    hydraulicErosion=0.5, thermalErosion=0.1, ridgeSharpening=0.35,
    soilCreep=0.05, continentSizeVariety=0.0, temperatureOffset=0.0,
    precipitationOffset=0.0, landCoverage=0.3,
)


def test_roundtrip_defaults():
    code = encode_planet_code(**DEFAULTS)
    assert len(code) == 22
    out = decode_planet_code(code)
    assert out is not None
    for k, v in DEFAULTS.items():
        assert out[k] == pytest.approx(v), k
    assert out["toggledIndices"] == []


def test_roundtrip_extremes():
    p = dict(DEFAULTS, seed=16777215, N=2560000, jitter=1.0, P=120,
             numContinents=10, roughness=0.5, terrainWarp=1.0, smoothing=1.0,
             glacialErosion=1.0, hydraulicErosion=1.0, thermalErosion=1.0,
             ridgeSharpening=1.0, soilCreep=1.0, continentSizeVariety=1.0,
             temperatureOffset=15, precipitationOffset=1.0, landCoverage=1.0)
    out = decode_planet_code(encode_planet_code(**p))
    for k, v in p.items():
        assert out[k] == pytest.approx(v), k


def test_roundtrip_minimums():
    p = dict(DEFAULTS, seed=0, N=5000, jitter=0.0, P=4, numContinents=1,
             roughness=0.0, temperatureOffset=-15, precipitationOffset=-1.0,
             landCoverage=0.0)
    out = decode_planet_code(encode_planet_code(**p))
    for k, v in p.items():
        assert out[k] == pytest.approx(v), k


def test_toggles():
    code = encode_planet_code(**DEFAULTS, toggledIndices=[0, 5, 79])
    assert "-" in code
    out = decode_planet_code(code)
    assert out["toggledIndices"] == [0, 5, 79]


def test_toggle_out_of_range_rejected():
    code = encode_planet_code(**DEFAULTS, toggledIndices=[100])
    # P=80 → toggle 100 invalid
    assert decode_planet_code(code) is None


def test_invalid_codes():
    assert decode_planet_code("") is None
    assert decode_planet_code("!" * 22) is None
    assert decode_planet_code("z" * 12) is None   # wrong length
    assert decode_planet_code(None) is None
    assert decode_planet_code("0" * 22) is not None  # all-zero is valid


def test_legacy_formats_decode_with_defaults():
    """Shorter codes decode with per-format defaults (7 generations)."""
    # Construct a 13-char legacy code by hand: pack via legacy radices
    legacy_radices = [21, 21, 51, 10, 117, 21, 2559]
    # values: he=10(0.5), sm=6(0.3), rough=25(0.25), cont=3(4), P=76(80),
    # jit=15(0.75), N=199(204000)
    idxs = [10, 6, 25, 3, 76, 15, 199]
    packed = 42  # seed
    for radix, idx in zip(reversed(legacy_radices), reversed(idxs)):
        packed = packed * radix + idx
    code = ""
    b36 = "0123456789abcdefghijklmnopqrstuvwxyz"
    v = packed
    while v:
        code = b36[v % 36] + code
        v //= 36
    code = code.rjust(13, "0")
    out = decode_planet_code(code)
    assert out is not None
    assert out["seed"] == 42
    assert out["N"] == 204000
    assert out["P"] == 80
    assert out["hydraulicErosion"] == pytest.approx(0.5)
    # defaults filled in
    assert out["terrainWarp"] == pytest.approx(0.5)
    assert out["landCoverage"] == pytest.approx(0.3)
    assert out["glacialErosion"] == 0
