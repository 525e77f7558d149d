"""Fused single-dispatch pipeline vs the staged path.

The production engine traces the entire device side (project → smooth →
elevation → erosion → climate) into one XLA program (pipeline/fused.py);
the timing path dispatches the same stage functions one by one. Both must
produce the same planet — differences are limited to XLA fusion rounding.

Cost layout (the fused group was 27.5 min of the fast tier in r4, all
XLA:CPU compile — measured per program: fused terrain ~7 min, fused edit
~7.3 min, fused post ~0.7 min, staged set ~9 min):

- the staged side is the session-scoped conftest canonical 4K result —
  shared with the product-surface files, so in a merged process the staged
  compile set is paid ONCE;
- every generate here uses the SAME 4K shape family, so the second staged
  engine (reapply comparison) hits the in-process jit caches and costs
  execution only;
- the fused editRecompute equivalence (its own ~7-min terrain-sized
  compile) is slow-tier.
"""

import numpy as np
import pytest

from planet_heightmap_generation_tpu.config import GenerationParams
from planet_heightmap_generation_tpu.pipeline import PlanetEngine

from conftest import CANON_PARAMS_KW

PARAMS = GenerationParams(**CANON_PARAMS_KW)


@pytest.fixture(scope="module")
def results(canon_engine_result):
    _, staged = canon_engine_result
    engine = PlanetEngine(timing=False)
    fused = engine.generate(PARAMS)
    fused2 = engine.generate(PARAMS.replace(seed=PARAMS.seed + 1))
    # staged reapply comparison: a fresh staged engine at the SAME shapes —
    # all staged kernels are module-level jits already compiled by the
    # canonical fixture, so this pays execution only
    staged_engine = PlanetEngine(timing=True)
    staged_engine.generate(PARAMS.replace(seed=PARAMS.seed + 1))
    re_fused = engine.reapply(sculpt=dict(smoothing=0.6))
    re_staged = staged_engine.reapply(sculpt=dict(smoothing=0.6))
    return fused, fused2, staged, re_fused, re_staged


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
    *_, re_fused, re_staged = results
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


@pytest.mark.slow
def test_fused_edit_matches_staged(canon_engine_result):
    """The fused editRecompute tail ≡ the staged edit path. Slow tier: the
    fused edit program is its own terrain-sized XLA:CPU compile (~7.3 min
    measured r5) — the equivalence is pinned here, the fast tier covers the
    edit path through the staged engine (test_pipeline)."""
    engine = PlanetEngine(timing=False)
    engine.generate(PARAMS.replace(seed=PARAMS.seed + 1))
    staged_engine = PlanetEngine(timing=True)
    staged_engine.generate(PARAMS.replace(seed=PARAMS.seed + 1))
    ed_fused = engine.edit_recompute((1,), skip_climate=True)
    ed_staged = staged_engine.edit_recompute((1,), skip_climate=True)
    a = np.asarray(ed_fused.elevation)
    b = np.asarray(ed_staged.elevation)
    assert np.abs(a - b).max() < 2e-3
    assert ed_fused.diagnostics()["nan_count"] == 0
