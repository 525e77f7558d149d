"""Multi-device scaling — sharding the cell dimension and batching seeds.

The reference's only parallelism is one Web Worker (SURVEY.md §2.10). The
TPU-native equivalents:

- **data parallelism over cells**: every field is [N]; shard N across the
  ``cells`` mesh axis with NamedSharding. Neighbor gathers at shard
  boundaries become XLA-inserted collectives over ICI — the halo exchange
  is implicit (gather indices are static, so XLA lowers them efficiently).
- **batch parallelism over seeds** (BASELINE config 5: 16-seed sweeps):
  vmap the field pipeline over a leading seed axis and shard that axis
  across devices — embarrassingly parallel, DCN-friendly across hosts.

Global reductions (stress p97, wind-speed p95) ride psum/sort collectives
XLA emits from the same jitted code — no hand-written communication.
"""

from __future__ import annotations

import contextlib
from functools import partial
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.noise import Tables, fbm


@contextlib.contextmanager
def no_persistent_cache():
    """Serializing multi-device CPU executables into jax's persistent
    compile cache segfaults (observed with the 8-device virtual mesh);
    sharded compiles run under this guard ON THE CPU BACKEND ONLY. TPU
    sharded executables serialize fine — and a real pod must not pay a
    full recompile per process — so the guard is a no-op there. The
    initialized cache singleton ignores config changes, so it must be
    reset on the way in AND out."""
    if jax.default_backend() != "cpu":
        yield
        return
    from jax._src import compilation_cache as _cc
    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    _cc.reset_cache()
    try:
        yield
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        _cc.reset_cache()


def make_planet_mesh(n_devices: Optional[int] = None,
                     seed_parallel: int = 1,
                     devices: Optional[Sequence] = None) -> Mesh:
    """Device mesh with ('seed', 'cells') axes. ``seed_parallel`` devices
    run independent planets; the rest shard the cell dimension. Falls back
    to the virtual CPU backend when the default backend has too few
    devices (single-chip dev boxes)."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if len(devs) < n_devices:
        devs = jax.devices("cpu")
    devs = np.asarray(devs[:n_devices])
    cells_parallel = n_devices // seed_parallel
    grid = devs.reshape(seed_parallel, cells_parallel)
    return Mesh(grid, axis_names=("seed", "cells"))


def cells_mesh(n_devices: Optional[int] = None,
               devices: Optional[Sequence] = None) -> Mesh:
    """1D device mesh with a single 'cells' axis — the production sharding
    for one planet: every [N]-leading field splits across devices, neighbor
    gathers at shard boundaries ride XLA collectives over ICI."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if len(devs) < n_devices:
        devs = jax.devices("cpu")
    return Mesh(np.asarray(devs[:n_devices]), axis_names=("cells",))


def shard_fused_args(mesh: Mesh, args):
    """Place the fused-pipeline argument tuple (engine.host_setup .args) on
    a 'cells' mesh: [n_padded]-leading arrays split over 'cells', everything
    else (plate tables, domes, noise tables, triangles) replicated. jax.jit
    then compiles the whole generate as one SPMD program."""
    g = args[0]
    n_padded = g.n_padded
    cells = NamedSharding(mesh, P("cells"))
    repl = NamedSharding(mesh, P())

    def place(a):
        if a is None or not hasattr(a, "shape"):
            return a
        if a.ndim >= 1 and a.shape[0] == n_padded:
            spec = P("cells", *([None] * (a.ndim - 1)))
            return jax.device_put(a, NamedSharding(mesh, spec))
        return jax.device_put(a, repl)

    return jax.tree_util.tree_map(place, args)


def shard_cells(mesh: Mesh, *arrays, batched: bool = False):
    """Place [N] / [N,K] arrays (or [B,N...] when batched) with the cell
    dimension split across the 'cells' axis."""
    out = []
    for a in arrays:
        if batched:
            spec = P("seed", "cells", *([None] * (a.ndim - 2)))
        else:
            spec = P("cells", *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, *arrays):
    out = [jax.device_put(a, NamedSharding(mesh, P())) for a in arrays]
    return out if len(out) > 1 else out[0]


def terrain_step(elev, pos, band_mask, rem_src, rem_dst, valid, perm, pm12,
                 band_off):
    """One full terrain step — the framework's 'training step' analog: fbm
    tectonic forcing, then one composite erosion iteration with the REAL
    production kernels (banded steepest-receiver routing, pointer-doubled
    flow accumulation, the exact Braun-Willett affine solve, talus-slope
    thermal transport, bilateral smoothing), closed by a global mean
    reduction that rides collectives when sharded. Pure function of arrays
    (+ the static band-offset tuple); jit/vmap/shard-friendly. Used by the
    compile-check entrypoints and the multi-chip dry run. Mirrors one
    iteration of erodeComposite (reference js/terrain-post.js:369-707)."""
    from ..erosion.fluvial import (steepest_receivers, flow_accumulation,
                                   stream_power_solve)
    from ..erosion.thermal import thermal_step
    from ..erosion.smooth import smooth_elevation
    from ..ops.banded import band_nbr_dist

    t = Tables(perm, pm12)
    x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    uplift = fbm(t, x * 4, y * 4, z * 4, 4) * 0.05
    e = elev + jnp.where(valid, uplift, 0.0)
    is_ocean = (e <= 0) & valid

    band_dist = band_nbr_dist(pos, band_off, band_mask)
    n = pos.shape[0]
    src = jnp.clip(rem_src, 0, n - 1)
    rem_dist = jnp.linalg.norm(pos[src] - pos[rem_dst],
                               axis=1).astype(jnp.float32)

    # hydraulic: route → accumulate → implicit stream-power solve
    rcv, dist, is_pit = steepest_receivers(
        e, is_ocean, valid, band_off, band_mask, band_dist,
        rem_src, rem_dst, rem_dist)
    land = (~is_ocean) & valid
    flow = flow_accumulation(land, rcv, is_pit, rounds=12)
    e = stream_power_solve(
        e, is_ocean, valid, rcv, dist, is_pit, flow,
        jnp.float32(3e-4), jnp.float32(0.5), jnp.float32(1.0), rounds=12)

    # thermal talus transport + ridge-preserving bilateral smooth
    e = thermal_step(e, is_ocean, valid, band_off, band_mask, band_dist,
                     rem_src, rem_dst, rem_dist,
                     jnp.float32(0.8), jnp.float32(0.15))
    e = smooth_elevation(e, is_ocean, valid, band_off, band_mask,
                         rem_src, rem_dst, 1, jnp.float32(0.3))

    # a global reduction so the sharded step exercises collectives
    mean_land = jnp.sum(jnp.where(valid, e, 0.0)) / jnp.maximum(
        1, jnp.sum(valid))
    return (e - 0.01 * mean_land).astype(jnp.float32)


def batched_terrain_step(mesh: Mesh, band_off: tuple):
    """jit of terrain_step vmapped over a seed batch and sharded over the
    ('seed','cells') mesh — the multi-chip 'training step' equivalent."""
    vstep = jax.vmap(partial(terrain_step, band_off=band_off),
                     in_axes=(0, None, None, None, None, None, 0, 0))

    in_shardings = (
        NamedSharding(mesh, P("seed", "cells")),        # elev [B, N]
        NamedSharding(mesh, P("cells", None)),           # pos
        NamedSharding(mesh, P("cells", None)),           # band_mask
        NamedSharding(mesh, P()),                        # rem_src (replicated)
        NamedSharding(mesh, P()),                        # rem_dst
        NamedSharding(mesh, P("cells")),                 # valid
        NamedSharding(mesh, P("seed", None)),            # perm [B, 512]
        NamedSharding(mesh, P("seed", None)),            # pm12
    )
    out_sharding = NamedSharding(mesh, P("seed", "cells"))
    return jax.jit(vstep, in_shardings=in_shardings,
                   out_shardings=out_sharding)
