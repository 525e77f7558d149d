"""Multi-seed batch sweeps — BASELINE config 5 (N-cell × S-seed batches).

The reference generates one planet at a time in its single Web Worker; a
seed sweep is S sequential full runs. Here the sweep is IN-GRAPH: the host
prologue (mesh, coarse tectonics, domes) runs per seed, its products stack
into [B]-leading arrays, and the whole fused device pipeline runs under ONE
``jax.vmap``-of-jit program — one compile, one dispatch per chunk, no host
round trips between seeds (SURVEY.md §7 "vmap from day one"). Chunking
bounds the [B,N,K] working set; a sequential per-seed fallback remains for
debugging (``vmap_chunk=1``).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..config import GenerationParams
from ..pipeline.engine import PlanetEngine, PlanetResult, host_setup
from ..pipeline.timing import StageTimer
from ..pipeline.fused import _pipeline, fused_pipeline


_VCACHE: Dict = {}


def _vmapped_pipeline(spec, batch: int):
    key = (spec, batch)
    fn = _VCACHE.get(key)
    if fn is None:
        from ..ops.sweep_pallas import no_pallas

        inner = partial(_pipeline, spec)

        def traced(*args):
            # vmap-of-pallas_call is not supported for these kernels; the
            # batched program uses the jnp sweep path
            with no_pallas():
                return jax.vmap(inner)(*args)

        fn = jax.jit(traced)
        _VCACHE[key] = fn
    return fn


def _stack_args(setups):
    """Stack per-seed fused-arg tuples into [B]-leading pytrees. Geobins
    candidate widths and triangle counts are data-dependent per seed, so
    ragged leaves are padded to the batch max before stacking."""
    args_list = [list(s.args) for s in setups]

    # pad geobins candidate arrays (proj[3], proj[4]) to a common K_c
    kc = max(a[1][3].shape[1] for a in args_list)
    for a in args_list:
        proj = list(a[1])
        pad = kc - proj[3].shape[1]
        if pad:
            proj[3] = jnp.pad(proj[3], ((0, 0), (0, pad)))
            proj[4] = jnp.pad(proj[4], ((0, 0), (0, pad)))
        a[1] = tuple(proj)

    # pad triangle lists (arg 8) with degenerate (0,0,0) rows
    tmax = max(a[8].shape[0] for a in args_list)
    for a in args_list:
        pad = tmax - a[8].shape[0]
        if pad:
            a[8] = jnp.pad(a[8], ((0, pad), (0, 0)))

    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[tuple(a) for a in args_list]), tmax


def generate_batch(params: GenerationParams, seeds: Sequence[int],
                   devices: Optional[Sequence] = None,
                   on_progress: Optional[Callable] = None,
                   engine: Optional[PlanetEngine] = None,
                   vmap_chunk: int = 0,
                   lean: bool = False,
                   ) -> List[PlanetResult]:
    """Run the full generation pipeline for every seed in ``seeds``.

    ``params.seed`` is ignored; each run uses ``params.replace(seed=s)``.
    Seeds execute in vmapped chunks of ``vmap_chunk`` (0 = auto: bounded by
    a ~2 GB [B,N,K] working-set heuristic); ``vmap_chunk=1`` degrades to
    the sequential per-seed engine path.

    ``lean=True`` keeps only the elevation per result — fetched to HOST
    memory, with every other device output dropped before the next seed
    runs. A retained full result pins ~30 debug/climate [N] device arrays
    (~0.5 GB at 4M cells); 16 of those would exhaust HBM mid-sweep, so
    large sweeps (bench config 5) must run lean.

    ``on_progress(seed_index, pct, label)`` mirrors the worker progress
    protocol per seed.
    """
    del devices  # single-process API compatibility; sharding handles devices
    prog = on_progress or (lambda i, pct, label: None)
    if vmap_chunk == 1:
        eng = engine or PlanetEngine()
        return [eng.generate(params.replace(seed=int(s)),
                             (lambda pct, label, _i=i: prog(_i, pct, label)))
                for i, s in enumerate(seeds)]

    if vmap_chunk <= 0:
        # [B,N,K=8,~10-col] f32 transients; keep under ~2 GB
        per_seed = params.n_cells * 8 * 10 * 4
        vmap_chunk = max(1, min(len(seeds), (2 << 30) // max(per_seed, 1)))

    results: List[PlanetResult] = []
    for c0 in range(0, len(seeds), vmap_chunk):
        chunk = [int(s) for s in seeds[c0:c0 + vmap_chunk]]
        setups = []
        for i, s in enumerate(chunk):
            prog(c0 + i, 5, "Host prologue…")
            setups.append(host_setup(params.replace(seed=s), max_super=32))
        spec = setups[0].spec
        assert all(st.spec == spec for st in setups), \
            "seed sweep must share one static spec"
        if len(chunk) == 1:
            outs = [fused_pipeline(spec)(*setups[0].args)]
        else:
            stacked, _ = _stack_args(setups)
            prog(c0, 40, "Device batch…")
            out_b = _vmapped_pipeline(spec, len(chunk))(*stacked)
            outs = [jax.tree_util.tree_map(lambda x, b=b: x[b], out_b)
                    for b in range(len(chunk))]
        for st, out in zip(setups, outs):
            results.append(_result_from_out(st, out, lean=lean))
        del outs  # lean: last refs to the chunk's device outputs
    return results


def _result_from_out(s, out, lean: bool = False) -> PlanetResult:
    n_tri = len(s.graph.triangles)
    if lean:
        # elevation to host NOW (syncs this seed's dispatch); every other
        # device array in `out` is released when the caller drops `outs`
        elevation = np.asarray(out["elevation"])
        return PlanetResult(
            graph=s.graph, params=s.params, r_plate=None,
            plate_seeds=s.plates.seeds, plate_is_ocean=s.plates.is_ocean,
            plate_density=s.plates.density,
            pre_post_elevation=None, elevation=elevation,
            t_elevation=None, stress=None, mountain_mask=None,
            coastline_mask=None, ocean_seed_mask=None,
            climate=None, debug={},
            timing=StageTimer(sync_enabled=False))
    return PlanetResult(
        graph=s.graph, params=s.params, r_plate=out["r_plate"],
        plate_seeds=s.plates.seeds, plate_is_ocean=s.plates.is_ocean,
        plate_density=s.plates.density,
        pre_post_elevation=out["pre_post"], elevation=out["elevation"],
        t_elevation=out["t_elevation"][:n_tri], stress=out["stress"],
        mountain_mask=out["mountain"], coastline_mask=out["coastline"],
        ocean_seed_mask=out["ocean_seeds"],
        climate=out["climate"], debug=out["debug"],
        timing=StageTimer(sync_enabled=False))


def sweep_heightmaps(params: GenerationParams, seeds: Sequence[int],
                     width: int = 8192,
                     devices: Optional[Sequence] = None):
    """Config-5 workload: S full generations + equirect heightmap export
    each. The generations run vmapped (generate_batch). With ``jitter=0``
    the mesh is seed-independent, so ONE rasterized cell-id map is shared
    by every seed's export (the reference's exportMapBatch geometry
    sharing, js/planet-mesh.js:1965-2180); jittered meshes differ per seed
    and rasterize individually. Yields (seed, result, image)."""
    from ..api.export import export_map, rasterize_cell_ids
    from ..mesh.device import to_device

    results = generate_batch(params, seeds, devices=devices, lean=True)
    shared_ids = None
    for s, res in zip(seeds, results):
        g = to_device(res.graph)
        if params.jitter == 0:
            if shared_ids is None:
                shared_ids = rasterize_cell_ids(g, width // 2, width)
            ids = shared_ids
        else:
            ids = None
        img = export_map(g, res.elevation, "heightmap",
                         height=width // 2, width=width, cell_ids=ids)
        yield int(s), res, img
