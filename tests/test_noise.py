"""Simplex noise tests: perm-table construction matches the reference's
Fisher-Yates consumption, and the vectorized evaluator reproduces a pure
float64 reimplementation of js/simplex-noise.js within f32 tolerance."""

import numpy as np
import pytest

from planet_heightmap_generation_tpu.ops.noise import (
    SimplexNoise,
    make_perm_tables,
    _GRAD,
)
from planet_heightmap_generation_tpu.ops.rng import ParkMiller


def _ref_noise3(perm, pm12, x, y, z):
    """Literal float64 port of the reference scalar algorithm (for testing)."""
    F, H = 1 / 3, 1 / 6
    s = (x + y + z) * F
    i, j, k = np.floor(x + s), np.floor(y + s), np.floor(z + s)
    t = (i + j + k) * H
    x0, y0, z0 = x - i + t, y - j + t, z - k + t
    if x0 >= y0:
        if y0 >= z0:
            i1, j1, k1, i2, j2, k2 = 1, 0, 0, 1, 1, 0
        elif x0 >= z0:
            i1, j1, k1, i2, j2, k2 = 1, 0, 0, 1, 0, 1
        else:
            i1, j1, k1, i2, j2, k2 = 0, 0, 1, 1, 0, 1
    else:
        if y0 < z0:
            i1, j1, k1, i2, j2, k2 = 0, 0, 1, 0, 1, 1
        elif x0 < z0:
            i1, j1, k1, i2, j2, k2 = 0, 1, 0, 0, 1, 1
        else:
            i1, j1, k1, i2, j2, k2 = 0, 1, 0, 1, 1, 0
    x1, y1, z1 = x0 - i1 + H, y0 - j1 + H, z0 - k1 + H
    x2, y2, z2 = x0 - i2 + 2 * H, y0 - j2 + 2 * H, z0 - k2 + 2 * H
    x3, y3, z3 = x0 - 1 + 3 * H, y0 - 1 + 3 * H, z0 - 1 + 3 * H
    ii, jj, kk = int(i) & 255, int(j) & 255, int(k) & 255
    total = 0.0
    for (dx, dy, dz, oi, oj, ok) in [
        (x0, y0, z0, 0, 0, 0),
        (x1, y1, z1, i1, j1, k1),
        (x2, y2, z2, i2, j2, k2),
        (x3, y3, z3, 1, 1, 1),
    ]:
        a = 0.6 - dx * dx - dy * dy - dz * dz
        if a > 0:
            a *= a
            g = _GRAD[pm12[ii + oi + perm[jj + oj + perm[kk + ok]]]]
            total += a * a * (g[0] * dx + g[1] * dy + g[2] * dz)
    return 32 * total


def test_perm_table_is_permutation():
    perm, pm12 = make_perm_tables(3.0)
    assert sorted(perm[:256].tolist()) == list(range(256))
    np.testing.assert_array_equal(perm[:256], perm[256:])
    np.testing.assert_array_equal(pm12, perm % 12)


def test_perm_table_consumes_rng_like_reference():
    # Fisher-Yates: 255 draws of rng()*(i+1) from i=255 down to 1
    seed = 9.0
    rng = ParkMiller(seed)
    p = list(range(256))
    for i in range(255, 0, -1):
        j = int(rng() * (i + 1))
        p[i], p[j] = p[j], p[i]
    perm, _ = make_perm_tables(seed)
    np.testing.assert_array_equal(perm[:256], p)


def test_noise_matches_reference_float64():
    seed = 5.0
    perm, pm12 = make_perm_tables(seed)
    sn = SimplexNoise(seed)
    rs = np.random.RandomState(0)
    pts = rs.uniform(-8, 8, size=(500, 3))
    ref = np.array([_ref_noise3(perm, pm12, *p) for p in pts])
    got = np.asarray(sn.noise3(pts[:, 0], pts[:, 1], pts[:, 2]))
    # f32 vs f64: small tolerance; corner-flip ties are measure-zero for
    # random points but allow a couple of outliers.
    err = np.abs(ref - got)
    assert np.median(err) < 1e-6
    assert (err < 1e-3).mean() > 0.99


def test_noise_range_and_zero_mean():
    sn = SimplexNoise(1.0)
    rs = np.random.RandomState(1)
    pts = rs.uniform(-20, 20, size=(20000, 3))
    v = np.asarray(sn.noise3(pts[:, 0], pts[:, 1], pts[:, 2]))
    assert np.abs(v).max() <= 1.0 + 1e-4
    assert abs(v.mean()) < 0.02


def test_fbm_and_ridged_shapes_and_range():
    sn = SimplexNoise(2.0)
    x = np.linspace(-3, 3, 1000)
    f = np.asarray(sn.fbm(x, x * 0.5, x * 0.25))
    r = np.asarray(sn.ridged_fbm(x, x * 0.5, x * 0.25))
    assert f.shape == (1000,)
    assert np.abs(f).max() <= 1.0 + 1e-4
    assert r.min() >= 0.0 and r.max() <= 2.0
