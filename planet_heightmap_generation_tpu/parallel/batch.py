"""Multi-seed batch sweeps — BASELINE config 5 (N-cell × S-seed batches).

The reference generates one planet at a time in its single Web Worker; a
seed sweep is S sequential full runs, each re-paying mesh build, plate
generation and every typed-array pass. The TPU-native sweep exploits two
facts:

- every kernel is shape-stable across seeds (same N → same [NP]/[NP,K]
  shapes), so the entire pipeline compiles exactly once and each additional
  seed costs only execution;
- seeds are embarrassingly parallel, so with a multi-device runtime each
  seed's field pipeline can be pinned to a different device
  (``jax.default_device``) and the per-stage device work of up to
  ``len(devices)`` seeds overlaps between host sync points.

For fully fused in-graph batching (vmap over a stacked seed axis) see
``sharding.batched_terrain_step`` — the per-seed *tectonic prologue*
(host coarse-grid plate generation) keeps the full engine pipeline out of a
single vmap for now, so the sweep batches at the pipeline level instead.
"""

from __future__ import annotations

import contextlib
from typing import Callable, List, Optional, Sequence

import jax

from ..config import GenerationParams
from ..pipeline.engine import PlanetEngine, PlanetResult


def generate_batch(params: GenerationParams, seeds: Sequence[int],
                   devices: Optional[Sequence] = None,
                   on_progress: Optional[Callable] = None,
                   engine: Optional[PlanetEngine] = None,
                   ) -> List[PlanetResult]:
    """Run the full generation pipeline for every seed in ``seeds``.

    ``params.seed`` is ignored; each run uses ``params.replace(seed=s)``.
    With ``devices`` (or >1 local device), seed i runs on
    ``devices[i % D]`` — data parallelism over the seed axis, the TPU
    equivalent of the reference's "generate S planets" batch workflows.

    ``on_progress(seed_index, pct, label)`` mirrors the worker progress
    protocol per seed.
    """
    engine = engine or PlanetEngine()
    devs = list(devices) if devices is not None else jax.devices()
    results: List[PlanetResult] = []
    for i, s in enumerate(seeds):
        dev = devs[i % len(devs)]
        ctx = jax.default_device(dev) if dev is not None else contextlib.nullcontext()
        prog = None
        if on_progress is not None:
            prog = lambda pct, label, _i=i: on_progress(_i, pct, label)
        with ctx:
            results.append(engine.generate(params.replace(seed=int(s)), prog))
    return results


def sweep_heightmaps(params: GenerationParams, seeds: Sequence[int],
                     width: int = 8192,
                     devices: Optional[Sequence] = None):
    """Config-5 workload: S full generations + equirect heightmap export
    each, sharing one rasterized cell-id map per mesh resolution when the
    mesh is seed-independent (jitter=0). Yields (seed, result, image)."""
    from ..api.export import export_map
    from ..mesh.device import to_device

    engine = PlanetEngine()
    for i, s in enumerate(seeds):
        res = generate_batch(params, [s], devices=devices, engine=engine)[0]
        g = to_device(res.graph)
        img = export_map(g, res.elevation, "heightmap",
                         height=width // 2, width=width)
        yield int(s), res, img
