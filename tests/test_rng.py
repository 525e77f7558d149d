"""Golden-value tests for the Park-Miller RNG (reference js/rng.js).

Golden values computed by hand-executing the reference algorithm:
    s0 = (|floor(seed*9301+49297)| mod 2147483646) + 1
    s  = s*16807 mod 2147483647;  out = (s-1)/2147483646
"""

import numpy as np

from planet_heightmap_generation_tpu.ops.rng import (
    ParkMiller,
    pm_sequence,
    pm_hash01,
)


def _js_rng(seed):
    s = abs(int(np.floor(seed * 9301 + 49297))) % 2147483646 + 1
    while True:
        s = (s * 16807) % 2147483647
        yield (s - 1) / 2147483646


def test_matches_js_algorithm_scalar():
    for seed in [0, 1, 42, 123456, 16777215, 0.5, -3]:
        ref = _js_rng(seed)
        rng = ParkMiller(seed)
        for _ in range(100):
            assert rng() == next(ref)


def test_vectorized_sequence_matches_scalar():
    for seed in [0, 7, 999]:
        rng = ParkMiller(seed)
        scalar = np.array([rng() for _ in range(257)])
        vec = pm_sequence(seed, 257)
        np.testing.assert_array_equal(scalar, vec)


def test_sequence_advances_state():
    a = ParkMiller(5)
    b = ParkMiller(5)
    first = a.sequence(10)
    rest = a.sequence(5)
    all15 = b.sequence(15)
    np.testing.assert_array_equal(np.concatenate([first, rest]), all15)


def test_rand_int_range():
    rng = ParkMiller(11)
    vals = [rng.rand_int(10) for _ in range(1000)]
    assert min(vals) >= 0 and max(vals) <= 9
    assert len(set(vals)) == 10  # all buckets hit


def test_hash01_deterministic_and_uniform():
    x = np.arange(10000)
    h = pm_hash01(x)
    assert np.all((h >= 0) & (h < 1))
    assert abs(h.mean() - 0.5) < 0.02
    np.testing.assert_array_equal(h, pm_hash01(x))
