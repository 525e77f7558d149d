"""Worker message protocol: typed responses, structured errors, progress."""

import numpy as np
import pytest

from planet_heightmap_generation_tpu.config import GenerationParams
from planet_heightmap_generation_tpu.pipeline.protocol import (WorkerProtocol,
                                                               COMMANDS)

# shape-aligned with the canonical test spec (conftest) so staged
# kernels compiled there are reused from the in-process jit cache
PARAMS = dict(seed=9, n_cells=4000, n_plates=12, num_continents=2,
              skip_climate=True)


@pytest.fixture(scope="module")
def worker_and_log():
    log = []
    w = WorkerProtocol(on_message=log.append)
    return w, log


def test_generate_done(worker_and_log):
    w, log = worker_and_log
    resp = w.dispatch(dict(cmd="generate", params=PARAMS))
    assert resp["type"] == "done", resp.get("stack")
    assert resp["diagnostics"]["nan_count"] == 0
    assert len(resp["elevation"]) == 4001  # N+1 incl. pole
    assert any(m.get("type") == "progress" for m in log)


def test_reapply_done(worker_and_log):
    w, _ = worker_and_log
    resp = w.dispatch(dict(cmd="reapply", sculpt=dict(smoothing=0.6),
                           skipClimate=True))
    assert resp["type"] == "reapplyDone", resp.get("stack")


def test_edit_recompute_done(worker_and_log):
    w, _ = worker_and_log
    resp = w.dispatch(dict(cmd="editRecompute", toggledIndices=(0,),
                           skipClimate=True))
    assert resp["type"] == "editDone", resp.get("stack")


def test_unknown_command_is_error(worker_and_log):
    w, _ = worker_and_log
    resp = w.dispatch(dict(cmd="explode"))
    assert resp["type"] == "error"
    assert "explode" in resp["message"]
    assert "stack" in resp


def test_bad_params_is_error_not_raise(worker_and_log):
    w, _ = worker_and_log
    resp = w.dispatch(dict(cmd="generate", params=dict(seed=-5)))
    assert resp["type"] == "error"
    assert "seed" in resp["message"]


def test_reapply_without_state_is_error():
    w = WorkerProtocol()
    resp = w.dispatch(dict(cmd="reapply"))
    assert resp["type"] == "error"
    assert "retained" in resp["message"].lower()


def test_degraded_climate_returns_terrain(monkeypatch):
    """Kill climate mid-run → generate still returns terrain + a structured
    error envelope; compute_climate afterwards succeeds (the reference's
    partial-result healing, js/generate.js:246-308)."""
    from planet_heightmap_generation_tpu.pipeline import PlanetEngine
    from planet_heightmap_generation_tpu.pipeline import engine as eng_mod

    engine = PlanetEngine(timing=True)  # staged path: per-stage seams
    boom = RuntimeError("climate OOM (injected)")

    def exploding_climate(*a, **k):
        raise boom

    monkeypatch.setattr(PlanetEngine, "_run_climate", exploding_climate)
    params = GenerationParams(seed=9, n_cells=4000, n_plates=12,
                              num_continents=2, skip_climate=False)
    result = engine.generate(params)
    assert result.climate is None
    assert result.error is not None
    assert result.error["stage"] == "climate"
    assert "injected" in result.error["message"]
    e = np.asarray(result.elevation)
    assert np.isfinite(e).all() and (e > 0).any()

    # healing: retry climate from retained state once the fault clears
    monkeypatch.undo()
    cl = engine.compute_climate()
    assert "koppen" in cl and cl["koppen"].shape[0] >= 3000

    # the protocol surfaces the envelope on an otherwise-done response
    monkeypatch.setattr(PlanetEngine, "_run_climate", exploding_climate)
    w = WorkerProtocol(engine=PlanetEngine(timing=True))
    resp = w.dispatch(dict(cmd="generate",
                           params=dict(PARAMS, skip_climate=False)))
    assert resp["type"] == "done"
    assert resp["error"]["stage"] == "climate"


def test_perf_log_written(tmp_path, monkeypatch):
    import json
    path = tmp_path / "perf.jsonl"
    monkeypatch.setenv("PLANET_PERF_LOG", str(path))
    from planet_heightmap_generation_tpu.pipeline import PlanetEngine
    PlanetEngine().generate(GenerationParams(**PARAMS))
    recs = [json.loads(l) for l in open(path)]
    assert recs and recs[-1]["kind"] == "generate"
    assert recs[-1]["n_cells"] == 4000
    assert recs[-1]["total_ms"] > 0
    assert "stages" in recs[-1]
