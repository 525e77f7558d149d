"""Fused single-dispatch pipeline vs the staged path.

The production engine traces the entire device side (project → smooth →
elevation → erosion → climate) into one XLA program (pipeline/fused.py);
the timing path dispatches the same stage functions one by one. Both must
produce the same planet — differences are limited to XLA fusion rounding.

All tests share ONE FusedSpec (the fused XLA compile is expensive on the
CPU test backend) — seed changes must not retrace, which is itself asserted.
"""

import numpy as np
import pytest

from planet_heightmap_generation_tpu.config import GenerationParams
from planet_heightmap_generation_tpu.pipeline import PlanetEngine

PARAMS = GenerationParams(seed=42, n_cells=5000, n_plates=12,
                          num_continents=3, skip_climate=False)


@pytest.fixture(scope="module")
def results():
    engine = PlanetEngine(timing=False)
    fused = engine.generate(PARAMS)
    fused2 = engine.generate(PARAMS.replace(seed=43))
    staged_engine = PlanetEngine(timing=True)
    staged = staged_engine.generate(PARAMS)
    # reapply/edit tails (fused vs staged) from the seed-43 retained state
    staged_engine.generate(PARAMS.replace(seed=43))
    re_fused = engine.reapply(sculpt=dict(smoothing=0.6))
    re_staged = staged_engine.reapply(sculpt=dict(smoothing=0.6))
    ed_fused = engine.edit_recompute((1,), skip_climate=True)
    ed_staged = staged_engine.edit_recompute((1,), skip_climate=True)
    return fused, fused2, staged, re_fused, re_staged, ed_fused, ed_staged


def test_fused_matches_staged_elevation(results):
    fused, _, staged, *_ = results
    a = np.asarray(fused.elevation)
    b = np.asarray(staged.elevation)
    assert np.abs(a - b).max() < 2e-3


def test_fused_matches_staged_climate(results):
    fused, _, staged, *_ = results
    k1 = np.asarray(fused.climate["koppen"])
    k2 = np.asarray(staged.climate["koppen"])
    # Köppen classes are discrete; fusion rounding may flip a handful of
    # borderline cells at most
    assert (k1 != k2).mean() < 0.01
    p1 = np.asarray(fused.climate["precip"]["r_precip_summer"])
    p2 = np.asarray(staged.climate["precip"]["r_precip_summer"])
    assert np.abs(p1 - p2).max() < 2e-2


def test_seed_changes_planet_without_retrace(results):
    """Seed sweeps must reuse the same compiled executable — everything
    seed-derived flows in as traced arrays (VERDICT.md round-1 item 3)."""
    from planet_heightmap_generation_tpu.pipeline import fused as fused_mod

    fused, fused2, *_ = results
    assert not np.array_equal(np.asarray(fused.elevation),
                              np.asarray(fused2.elevation))
    # one spec in the cache, compiled exactly once despite two seeds
    assert len(fused_mod._CACHE) == 1
    compiled = next(iter(fused_mod._CACHE.values()))
    assert compiled._cache_size() == 1


def test_fused_diagnostics(results):
    fused, fused2, *_ = results
    for r in (fused, fused2):
        d = r.diagnostics()
        assert d["nan_count"] == 0
        assert 0.05 < d["land_fraction"] < 0.7


def test_fused_reapply_matches_staged(results):
    """The fused reapply tail (one dispatch) ≡ the staged reapply."""
    _, _, _, re_fused, re_staged, _, _ = results
    a = np.asarray(re_fused.elevation)
    b = np.asarray(re_staged.elevation)
    # XLA reassociates float sums differently between the fused and staged
    # programs, and the flood/drain recurrences amplify last-bit noise into
    # localized ~0.01 differences; the bound is loose on elevation and the
    # derived Köppen classes below are the tight semantic check
    assert np.abs(a - b).max() < 2e-2
    k1 = np.asarray(re_fused.climate["koppen"])
    k2 = np.asarray(re_staged.climate["koppen"])
    assert (k1 != k2).mean() < 0.01


def test_fused_edit_matches_staged(results):
    """The fused editRecompute tail ≡ the staged edit path."""
    *_, ed_fused, ed_staged = results
    a = np.asarray(ed_fused.elevation)
    b = np.asarray(ed_staged.elevation)
    assert np.abs(a - b).max() < 2e-3
    assert ed_fused.diagnostics()["nan_count"] == 0
