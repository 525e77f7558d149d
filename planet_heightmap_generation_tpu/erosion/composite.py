"""Composite erosion loop and the full terrain post-processing stage.

Re-design of reference erodeComposite (js/terrain-post.js:369-707) and
runPostProcessing (js/planet-worker.js:40-102): interleaves glacial →
hydraulic → thermal per iteration, with an initial priority-flood carve
(0.5) before hydraulic and a mid-loop re-flood (0.85) at 75% of iterations.
Iteration structure is a host loop over jitted per-step kernels (counts are
small and static); the reference's per-iteration land sort disappears —
ordering is subsumed by the pointer-doubling solvers. All neighbor sweeps
ride the banded roll representation (ops/banded); the per-edge lengths are
computed once per stage as [N,D] / [M] arrays.

Slider → parameter mapping matches js/planet-worker.js:58-93.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.device import DeviceGraph
from ..ops.noise import tables
from ..ops.banded import band_nbr_dist
from .flood import priority_flood_carve
from .fluvial import steepest_receivers, flow_accumulation, stream_power_solve
from .thermal import thermal_step
from .glacial import glaciation_index, glacial_step, glacial_post_smooth
from .smooth import smooth_elevation, sharpen_ridges, apply_soil_creep
from .warp import warp_terrain


def _edge_lengths(g: DeviceGraph):
    """([N,D] banded edge lengths, [M] remainder edge lengths)."""
    band_dist = band_nbr_dist(g.pos, g.band_off, g.band_mask)
    n = g.n_padded
    src = jnp.clip(g.rem_src, 0, n - 1)
    rem_dist = jnp.linalg.norm(g.pos[src] - g.pos[g.rem_dst],
                               axis=1).astype(jnp.float32)
    return band_dist, rem_dist


def erode_composite(g: DeviceGraph, elev, is_ocean,
                    h_iters: int, k_coeff: float, m_exp: float, dt: float,
                    t_iters: int, talus_slope: float, k_thermal: float,
                    g_iters: int, glacial_strength: float):
    total = max(h_iters, t_iters, g_iters)
    if total <= 0:
        return elev

    valid = g.valid
    bands = g.bands
    band_dist, rem_dist = _edge_lengths(g)

    # ocean mask is frozen for the whole loop → ONE components call serves
    # both the initial flood and the 75% re-flood
    open_ocean = None
    if h_iters > 0:
        from .flood import open_ocean_mask
        open_ocean = open_ocean_mask(is_ocean, valid, *bands)
        elev, _, _ = priority_flood_carve(
            elev, is_ocean, valid, *bands, jnp.float32(0.5),
            open_ocean=open_ocean)

    glac_idx = None
    if g_iters > 0 and glacial_strength > 0:
        glac_idx = glaciation_index(g.pos, elev, is_ocean, valid,
                                    jnp.float32(glacial_strength))
    g_scale = 1.0 / g_iters if g_iters > 0 else 0.0

    # The iteration loop is a lax.scan over per-iteration step flags — NOT a
    # Python unroll: up to 25 unrolled iterations (each containing banded
    # argmin selects and pointer-doubling while loops) dominated the fused
    # executable's size, and executable BYTES are the dominant cold-start
    # cost shipped over the tunneled backend. The scan body appears once per
    # segment; lax.cond skips a step's execution in iterations where its
    # slider count has run out. The mid-loop re-flood at 75% of iterations
    # (js/terrain-post.js:444-462) splits the scan into two segments.
    def step(elev, flags):
        do_g, do_h, do_t = flags
        if glac_idx is not None:
            elev = jax.lax.cond(
                do_g,
                lambda e: glacial_step(
                    e, is_ocean, valid, g.band_off, g.band_mask, band_dist,
                    g.rem_src, g.rem_dst, rem_dist, glac_idx,
                    jnp.float32(glacial_strength), jnp.float32(g_scale)),
                lambda e: e, elev)
        if h_iters > 0:
            def hyd(e):
                rcv, dist, is_pit = steepest_receivers(
                    e, is_ocean, valid, g.band_off, g.band_mask, band_dist,
                    g.rem_src, g.rem_dst, rem_dist)
                land = (~is_ocean) & valid
                flow = flow_accumulation(land, rcv, is_pit)
                return stream_power_solve(
                    e, is_ocean, valid, rcv, dist, is_pit, flow,
                    jnp.float32(k_coeff), jnp.float32(m_exp),
                    jnp.float32(dt))
            elev = jax.lax.cond(do_h, hyd, lambda e: e, elev)
        if t_iters > 0:
            elev = jax.lax.cond(
                do_t,
                lambda e: thermal_step(
                    e, is_ocean, valid, g.band_off, g.band_mask, band_dist,
                    g.rem_src, g.rem_dst, rem_dist,
                    jnp.float32(talus_slope), jnp.float32(k_thermal)),
                lambda e: e, elev)
        return elev, None

    def run_segment(elev, lo, hi):
        if hi <= lo:
            return elev
        its = np.arange(lo, hi)
        flags = (jnp.asarray(its < g_iters if glac_idx is not None
                             else np.zeros(len(its), bool)),
                 jnp.asarray(its < h_iters),
                 jnp.asarray(its < t_iters))
        elev, _ = jax.lax.scan(step, elev, flags)
        return elev

    mid_flood_iter = round(total * 0.75)
    mid = mid_flood_iter if mid_flood_iter < total else total
    elev = run_segment(elev, 0, mid)
    if mid < total:
        elev, _, _ = priority_flood_carve(
            elev, is_ocean, valid, *bands, jnp.float32(0.85),
            open_ocean=open_ocean)
        elev = run_segment(elev, mid, total)

    if glac_idx is not None:
        elev = glacial_post_smooth(elev, is_ocean, valid, *bands, glac_idx)
    return elev


def run_post_processing(g: DeviceGraph, elev, seed: int, params: dict,
                        hotspot: Optional[jax.Array] = None,
                        avg_edge: Optional[float] = None,
                        warp_t=None):
    """Full post stage with the worker's slider mapping
    (js/planet-worker.js:40-102). ``params`` keys: smoothing,
    glacial_erosion, hydraulic_erosion, thermal_erosion, ridge_sharpening,
    terrain_warp. Returns (elevation, erosion_delta).

    ``avg_edge`` (mean neighbor distance, a host-known mesh property) and
    ``warp_t`` (seed+9999 noise tables) can be supplied by the engine
    prologue so the whole stage is traceable with no device reads."""
    smoothing = params.get("smoothing", 0.0)
    glacial = params.get("glacial_erosion", 0.0)
    hydraulic = params.get("hydraulic_erosion", 0.0)
    thermal = params.get("thermal_erosion", 0.0)
    ridge = params.get("ridge_sharpening", 0.0)
    tw = params.get("terrain_warp", 0.0)

    if tw > 0:
        max_amp = 0.12 * tw
        if avg_edge is None:
            avg_edge = float(
                jnp.sum(g.nbr_dist) / jnp.maximum(1, jnp.sum(g.nbr_mask)))
        max_steps = int(math.ceil(max_amp / max(avg_edge, 1e-6))) + 8
        hot = hotspot if hotspot is not None else jnp.zeros_like(elev)
        elev = warp_terrain(elev, g.pos, g.valid, *g.bands,
                            noise_t=warp_t if warp_t is not None
                            else tables(seed + 9999),
                            strength=jnp.float32(tw), hotspot=hot,
                            max_steps=max_steps)

    # ocean mask frozen BEFORE smoothing/erosion (js/planet-worker.js:51-54)
    is_ocean = (elev <= 0) & g.valid
    pre = elev

    if smoothing > 0:
        iters = round(1 + smoothing * 4)
        strength = 0.2 + smoothing * 0.5
        elev = smooth_elevation(elev, is_ocean, g.valid, *g.bands,
                                iters, jnp.float32(strength))

    if glacial > 0 or hydraulic > 0 or thermal > 0:
        elev = erode_composite(
            g, elev, is_ocean,
            h_iters=round(hydraulic * 20), k_coeff=hydraulic * 0.0006,
            m_exp=0.5, dt=1.0,
            t_iters=round(thermal * 10), talus_slope=1.2 - thermal * 0.4,
            k_thermal=thermal * 0.15,
            g_iters=round(glacial * 10), glacial_strength=glacial)

    if ridge > 0:
        iters = round(1 + ridge * 3)
        elev = sharpen_ridges(elev, is_ocean, g.valid, *g.bands,
                              iters, jnp.float32(ridge * 0.08))

    # soil creep always applied (js/planet-worker.js:92)
    elev = apply_soil_creep(elev, is_ocean, g.valid, *g.bands,
                            3, jnp.float32(0.1125))

    erosion_delta = elev - pre
    return elev, erosion_delta
