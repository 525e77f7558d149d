"""Fused production pipeline — the whole device side of ``generate`` as ONE
jitted program.

The staged path (engine.py) dispatches ~40 kernels per planet; on a
high-latency backend (remote TPU) per-dispatch overhead dominates wall
clock. Here project → smooth → elevation → erosion → climate trace into a
single XLA program: one dispatch, one final sync, full cross-stage fusion
and buffer reuse. The reference's analog is the single
``handleGenerate`` worker message covering the same span
(js/planet-worker.js:136-339).

Staticness contract: everything structure-shaping is baked per
:class:`FusedSpec` (cell count via shapes, plate count, erosion iteration
counts, band widths derived from N, skip flags) and the compiled program is
cached per spec — while everything *seed-derived* flows in as traced arrays
(noise tables, domes, plate properties, hash salt), so sweeping seeds never
retraces.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import GenerationParams
from ..mesh.device import DeviceGraph
from ..ops.graph import majority_smooth
from ..ops.banded import connected_components_gated, flood_assign_banded
from ..elevation import assign_elevation
from ..erosion import run_post_processing
from ..climate import (compute_wind, compute_ocean_currents,
                       compute_precipitation, compute_temperature,
                       classify_koppen)


def smooth_and_reconnect(g: DeviceGraph, r_plate, num_p: int, num_passes=3):
    """Hi-res plate smoothing + reconnection on device (the reference runs
    smoothAndReconnectPlates on the projected map, js/planet-worker.js:173).
    Seed protection is a no-op after projection (js/plates.js:246-250).
    ``num_p`` is the host-known plate count (keeps the stage sync-free)."""
    protect = jnp.zeros(g.n_padded, bool)
    r_plate = majority_smooth(r_plate, g.nbr_idx, g.nbr_mask, protect,
                              num_passes=num_passes)

    labels = connected_components_gated(r_plate, *g.bands)
    n = g.n_padded
    sizes = jax.ops.segment_sum(
        g.valid.astype(jnp.int32), labels, num_segments=n)
    comp_size = sizes[labels]
    max_per_plate = jax.ops.segment_max(
        jnp.where(g.valid, comp_size, 0), r_plate, num_segments=num_p)
    is_max = comp_size == max_per_plate[r_plate]
    # tie-break toward the smallest label
    min_tied = jax.ops.segment_min(
        jnp.where(is_max & g.valid, labels, n), r_plate, num_segments=num_p)
    in_main = is_max & (labels == min_tied[r_plate]) & g.valid
    val, _ = flood_assign_banded(r_plate, in_main, *g.bands)
    return jnp.where(g.valid, val, r_plate).astype(jnp.int32)


@dataclasses.dataclass(frozen=True)
class FusedSpec:
    """Hashable static configuration of one fused compile. ``params`` is
    normalized (seed=0, toggles=()) so seed sweeps and plate edits share the
    same executable."""

    params: GenerationParams
    num_plates: int
    has_super: bool
    has_domes: bool
    n_lat: int                      # coarse geobins grid dims (projection)
    n_lon: int
    skip_climate: bool
    # True → trace with the jnp sweep loops even on TPU (the sharded mesh
    # path: XLA cannot auto-partition a pallas_call). Part of the spec so
    # the jit trace cache never aliases a pallas trace into a sharded
    # lowering.
    jnp_sweeps: bool = False

    @staticmethod
    def of(params: GenerationParams, num_plates: int, has_super: bool,
           has_domes: bool, n_lat: int, n_lon: int,
           skip_climate: bool, jnp_sweeps: bool = False) -> "FusedSpec":
        return FusedSpec(
            params=params.replace(seed=0, toggled_indices=(),
                                  skip_climate=None),
            num_plates=num_plates, has_super=has_super, has_domes=has_domes,
            n_lat=n_lat, n_lon=n_lon, skip_climate=skip_climate,
            jnp_sweeps=jnp_sweeps)


def _pipeline(spec: FusedSpec, g: DeviceGraph, proj, plate, sup,
              domes: Dict, nt: Dict, warp_t, climate_t, triangles, seed32):
    """The traced body. All array args are seed-dependent; ``spec`` is the
    static shape/config key."""
    from ..tectonics.coarse import _project_kernel
    from ..ops.noise import _GRAD_J

    perm, pm12, perturb_amp, bins_idx, bins_mask, bins_points, coarse_plate = proj
    r_plate = _project_kernel(
        g.pos, perm, pm12, _GRAD_J, perturb_amp,
        bins_idx, bins_mask, bins_points, coarse_plate,
        spec.n_lat, spec.n_lon)
    r_plate = smooth_and_reconnect(g, r_plate, spec.num_plates, 3)
    return _pipeline_from_plates(spec, g, r_plate, plate, sup, domes, nt,
                                 warp_t, climate_t, triangles, seed32)


def _pipeline_from_plates(spec: FusedSpec, g: DeviceGraph, r_plate, plate,
                          sup, domes: Dict, nt: Dict, warp_t, climate_t,
                          triangles, seed32):
    """The pipeline from an existing hi-res plate map — the editRecompute
    span (js/planet-worker.js:442-577) and the tail of generate."""
    p = spec.params
    n = g.n_cells
    avg_edge_nom = math.pi / math.sqrt(n)

    p_ocean, p_pole, p_omega, p_dens = plate
    kw = {}
    if spec.has_super:
        plate_to_super, s_ocean, s_pole, s_omega, s_dens = sup
        kw = dict(r_super_plate=plate_to_super[r_plate],
                  super_is_ocean=s_ocean, super_pole=s_pole,
                  super_omega=s_omega, super_density=s_dens)
    elev_res = assign_elevation(
        g, r_plate, p_ocean, p_pole, p_omega, p_dens,
        seed=seed32, noise_mag=p.roughness, spread=p.spread,
        noise_pack=nt, domes=domes if spec.has_domes else {}, **kw)

    pdict = dataclasses.asdict(p)
    elevation, erosion_delta = run_post_processing(
        g, elev_res.elevation, 0, pdict,
        hotspot=elev_res.debug.get("hotspot"),
        avg_edge=avg_edge_nom, warp_t=warp_t)

    debug = dict(elev_res.debug)
    debug["erosionDelta"] = erosion_delta

    out = dict(
        r_plate=r_plate,
        pre_post=elev_res.elevation,
        elevation=elevation,
        stress=elev_res.stress,
        mountain=elev_res.mountain,
        coastline=elev_res.coastline,
        ocean_seeds=elev_res.ocean_seeds,
        t_elevation=jnp.mean(elevation[triangles], axis=1),
        climate=None,
    )

    if not spec.skip_climate:
        # all five climate coast-distance fields (wind continentality pair
        # + ocean all/west/east coast) relax in ONE [N,5] BFS loop
        p = spec.params
        _climate_stack(g, elevation, p_ocean, r_plate, climate_t,
                       p.precipitation_offset, p.temperature_offset,
                       p.land_coverage, out, debug)
    out["debug"] = debug
    return out


def _climate_stack(g, elevation, p_ocean, r_plate, climate_t,
                   precip_off, temp_off, land_cov, out, debug):
    """Shared climate tail (wind → ocean → precip → temp → Köppen) with the
    merged 5-field coast BFS; fills out['climate'] and the debug layers.
    Slider offsets may be Python floats (in-graph callers) or traced f32
    scalars (the standalone climate program, which thereby serves EVERY
    offset value with one executable)."""
    from ..climate.wind import climate_coast_fields

    d5, aux = climate_coast_fields(g, elevation, p_ocean, r_plate)
    wind = compute_wind(g, elevation, p_ocean, r_plate, climate_t,
                        coast_d=d5[:, :2], gf=aux["gf"],
                        is_land=aux["is_land"],
                        plate_land=aux["plate_land"])
    ocean = compute_ocean_currents(g, elevation, wind, coast_d=d5[:, 2:])
    precip = compute_precipitation(
        g, elevation, wind, ocean, precip_off, land_cov)
    temp = compute_temperature(
        g, elevation, wind, ocean, precip, temp_off)
    koppen = classify_koppen(
        elevation, temp["r_temperature_summer"],
        temp["r_temperature_winter"], precip["r_precip_summer"],
        precip["r_precip_winter"])
    out["climate"] = dict(wind=wind, ocean=ocean, precip=precip,
                          temp=temp, koppen=koppen)
    debug.update(
        pressureSummer=wind["r_pressure_summer"],
        pressureWinter=wind["r_pressure_winter"],
        windSpeedSummer=wind["r_wind_speed_summer"],
        windSpeedWinter=wind["r_wind_speed_winter"],
        continentality=wind["r_continentality"],
        precipSummer=precip["r_precip_summer"],
        precipWinter=precip["r_precip_winter"],
        rainShadowSummer=precip["r_rainshadow_summer"],
        rainShadowWinter=precip["r_rainshadow_winter"],
        tempSummer=temp["r_temperature_summer"],
        tempWinter=temp["r_temperature_winter"],
        koppen=koppen,
    )


def _post_pipeline(spec: FusedSpec, g, pre_post, hotspot, p_ocean, r_plate,
                   warp_t, climate_t, triangles):
    """Fused reapply / import tail: erosion post-processing from a retained
    pre-post elevation + the climate stack (the worker's 'reapply' span,
    js/planet-worker.js:341-440) — one dispatch, one sync."""
    p = spec.params
    avg_edge_nom = math.pi / math.sqrt(g.n_cells)
    elevation, erosion_delta = run_post_processing(
        g, pre_post, 0, dataclasses.asdict(p),
        hotspot=hotspot, avg_edge=avg_edge_nom, warp_t=warp_t)
    debug = dict(erosionDelta=erosion_delta)
    out = dict(
        elevation=elevation,
        t_elevation=jnp.mean(elevation[triangles], axis=1),
        climate=None,
    )
    if not spec.skip_climate:
        _climate_stack(g, elevation, p_ocean, r_plate, climate_t,
                       p.precipitation_offset, p.temperature_offset,
                       p.land_coverage, out, debug)
    out["debug"] = debug
    return out


def _climate_pipeline(g: DeviceGraph, elevation, p_ocean, r_plate,
                      climate_t, precip_off, temp_off, land_cov):
    """The standalone climate program: wind → ocean → precip → temp →
    Köppen from a finished elevation. Split out of the terrain mega-program
    (round-2 verdict #8): the two executables are each roughly half the
    size of the old fused-with-climate one — the dominant cold-start cost
    over the tunneled backend is SHIPPING the deserialized executable, so
    halving the largest entry halves the worst rung — and this one program
    is shared by generate, reapply, edit_recompute and compute_climate at
    the same (N, P) shapes, for every slider-offset value (offsets are
    traced scalars). Cost: one extra dispatch per generate (~8 ms) and the
    lost terrain↔climate cross-stage fusion, which is a handful of [N]
    elementwise ops at a seam that is wide anyway."""
    out: Dict = {}
    debug: Dict = {}
    _climate_stack(g, elevation, p_ocean, r_plate, climate_t,
                   precip_off, temp_off, land_cov, out, debug)
    return out["climate"], debug


_CACHE: Dict[FusedSpec, object] = {}
_POST_CACHE: Dict[FusedSpec, object] = {}
_EDIT_CACHE: Dict[FusedSpec, object] = {}
_CLIMATE_FNS: Dict[bool, object] = {}


def _maybe_jnp_sweeps(spec, fn, name):
    """Wrap ``fn`` so tracing runs under no_pallas() when the spec asks
    for jnp sweeps (the sharded path). ``name`` becomes the jit function
    name and so the HLO module / persistent-cache entry name — r4's
    config2 prewarm MISS reported an unactionable "jit__unknown" because
    every fused program was an anonymous functools.partial (VERDICT r4
    #3); now cache evidence lines identify the program and cell count."""
    if not spec.jnp_sweeps:
        def named(*args):
            return fn(*args)
        named.__name__ = name
        return named
    from ..ops.sweep_pallas import no_pallas

    def wrapper(*args):
        with no_pallas():
            return fn(*args)
    wrapper.__name__ = name + "_jnp"
    return wrapper


def _spec_name(kind: str, spec: FusedSpec) -> str:
    n = spec.params.n_cells
    return f"fused_{kind}_{n // 1000}k" if n >= 1000 else f"fused_{kind}_{n}"


def fused_climate_pipeline(jnp_sweeps: bool = False):
    """The jitted standalone climate program (jit specializes per (N, P)
    input shapes; slider offsets are traced, so one executable serves every
    offset). ``jnp_sweeps=True`` is the sharded variant (no pallas)."""
    fn = _CLIMATE_FNS.get(jnp_sweeps)
    if fn is None:
        if jnp_sweeps:
            from ..ops.sweep_pallas import no_pallas

            def traced(*args):
                with no_pallas():
                    return _climate_pipeline(*args)
            traced.__name__ = "fused_climate_jnp"
            fn = jax.jit(traced)
        else:
            fn = jax.jit(_climate_pipeline)
        _CLIMATE_FNS[jnp_sweeps] = fn
    return fn


def fused_edit_pipeline(spec: FusedSpec):
    """Jitted elevation→erosion→climate from a retained plate map
    (editRecompute), cached."""
    fn = _EDIT_CACHE.get(spec)
    if fn is None:
        import functools
        fn = jax.jit(_maybe_jnp_sweeps(
            spec, functools.partial(_pipeline_from_plates, spec),
            _spec_name("edit", spec)))
        _EDIT_CACHE[spec] = fn
    return fn


def fused_pipeline(spec: FusedSpec):
    """The jitted single-dispatch pipeline for one static spec (cached)."""
    fn = _CACHE.get(spec)
    if fn is None:
        import functools
        fn = jax.jit(_maybe_jnp_sweeps(
            spec, functools.partial(_pipeline, spec),
            _spec_name("terrain", spec)))
        _CACHE[spec] = fn
    return fn


def fused_post_pipeline(spec: FusedSpec):
    """Jitted post tail (the engine's fused *reapply* dispatch), cached.

    ``pre_post`` and ``hotspot`` (argnums 1, 2) are DONATED: the engine
    retains them host-side between commands (engine.py `_host_retained`)
    and uploads a fresh device copy per call, so XLA aliases the output
    elevation onto the input buffer instead of allocating a second [N]
    array — the reference's transferable-buffer move semantics
    (js/planet-worker.js:328-334) applied to HBM (SURVEY §2.10 "donated
    buffers").

    CALLER CONTRACT (ADVICE r3): argnums 1 and 2 MUST be freshly-uploaded
    throwaway device buffers (``jnp.asarray`` of host numpy obtained via
    ``engine._host_retained``), NEVER a retained device array — donation
    invalidates the input buffer, and donating a retained array would break
    every later command that reads it (deleted-buffer RuntimeError). The
    only call site today is engine.reapply; new callers must follow the
    same _host_retained → jnp.asarray upload pattern."""
    fn = _POST_CACHE.get(spec)
    if fn is None:
        import functools
        fn = jax.jit(_maybe_jnp_sweeps(
            spec, functools.partial(_post_pipeline, spec),
            _spec_name("post", spec)),
            donate_argnums=(1, 2))
        _POST_CACHE[spec] = fn
    return fn
