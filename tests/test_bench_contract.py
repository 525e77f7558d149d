"""bench.py result-integrity contract (VERDICT r4 weak #5).

The engine's climate seam degrades to terrain-only on a stage error; a
bench rung labeled "full climate" must FAIL LOUDLY rather than report an
artificially fast wall for a planet that silently dropped climate."""

import os
import sys
import types

import numpy as np
import pytest


def _import_bench(monkeypatch):
    # bench re-execs unless PYTHONHASHSEED=0 (HLO cache-key stability);
    # pin it before import so the import is side-effect-free here
    monkeypatch.setenv("PYTHONHASHSEED", "0")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    return bench


class _FakeTiming:
    stages = []


class _FakeResult:
    def __init__(self, error=None, climate="present"):
        self.elevation = np.zeros(16, np.float32)
        self.error = error
        self.climate = (dict(koppen=np.zeros(16, np.int32))
                        if climate == "present" else None)
        self.timing = _FakeTiming()

    def diagnostics(self):
        return dict(nan_count=0, land_fraction=0.3)


class _FakeEngine:
    def __init__(self, result):
        self._r = result

    def generate(self, params):
        return self._r


def _params(skip_climate):
    from planet_heightmap_generation_tpu.config import GenerationParams
    return GenerationParams(seed=1, n_cells=5000,
                            skip_climate=skip_climate)


def test_run_once_rejects_stage_error(monkeypatch):
    bench = _import_bench(monkeypatch)
    r = _FakeResult(error=dict(stage="climate", message="boom"))
    with pytest.raises(AssertionError, match="stage error"):
        bench._run_once(_FakeEngine(r), _params(skip_climate=False))


def test_run_once_rejects_silently_missing_climate(monkeypatch):
    bench = _import_bench(monkeypatch)
    r = _FakeResult(error=None, climate=None)
    with pytest.raises(AssertionError, match="climate"):
        bench._run_once(_FakeEngine(r), _params(skip_climate=False))


def test_run_once_accepts_clean_result(monkeypatch):
    bench = _import_bench(monkeypatch)
    wall, r = bench._run_once(_FakeEngine(_FakeResult()),
                              _params(skip_climate=False))
    assert wall >= 0 and r.error is None


def test_run_once_allows_missing_climate_when_skipped(monkeypatch):
    bench = _import_bench(monkeypatch)
    wall, _ = bench._run_once(_FakeEngine(_FakeResult(climate=None)),
                              _params(skip_climate=True))
    assert wall >= 0
