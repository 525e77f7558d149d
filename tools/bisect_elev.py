"""Sub-bisection of the elevation stage with forced liveness.

Each prefix returns the SUM of every major intermediate computed so far, so
XLA cannot dead-code-eliminate earlier stages out of a cut point (the first
version returned only one array per stage and attributed collision work to
the stress stage).

    python tools/bisect_elev.py [n_cells] [stage ...]

Stages: col stress dists carry bands assembly coastal arcs hotspots
"""

import os
import sys
import time

if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools  # noqa: E402
import math  # noqa: E402

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import planet_heightmap_generation_tpu  # noqa: E402
from planet_heightmap_generation_tpu.config import GenerationParams  # noqa: E402
from planet_heightmap_generation_tpu.pipeline.engine import (  # noqa: E402
    host_setup, prime_device_transfer)
import planet_heightmap_generation_tpu.elevation.assemble as A  # noqa: E402

STAGES = ["col", "stress", "dists", "carry", "bands", "assembly",
          "coastal", "arcs", "hotspots"]


def _run_prefix(stage, spec, g, proj, plate, sup, domes, nt, warp_t,
                climate_t, triangles, seed32):
    from planet_heightmap_generation_tpu.tectonics.coarse import _project_kernel
    from planet_heightmap_generation_tpu.ops.noise import _GRAD_J
    from planet_heightmap_generation_tpu.pipeline import fused as F
    from planet_heightmap_generation_tpu.elevation.collisions import (
        find_collisions)
    from planet_heightmap_generation_tpu.elevation.hotspots import (
        hotspot_uplift)
    from planet_heightmap_generation_tpu.ops.banded import (
        band_gate, rem_gate_eq, propagate_stress_banded,
        bfs_hops_multi_banded, band_bfs_banded, banded_sum)
    from planet_heightmap_generation_tpu.ops.graph import hash01

    acc = []          # liveness accumulator: every stage's outputs feed it

    def live(*arrays):
        for a in arrays:
            acc.append(jnp.sum(a.astype(jnp.float32)))

    def done():
        return functools.reduce(jnp.add, acc)

    perm, pm12, perturb_amp, bins_idx, bins_mask, bins_points, coarse_plate \
        = proj
    r_plate = _project_kernel(
        g.pos, perm, pm12, _GRAD_J, perturb_amp,
        bins_idx, bins_mask, bins_points, coarse_plate, spec.n_lat, spec.n_lon)
    r_plate = F.smooth_and_reconnect(g, r_plate, spec.num_plates, 3)
    live(r_plate)

    p = spec.params
    plate_is_ocean, plate_pole, plate_omega, plate_density = plate
    plate_to_super, s_ocean, s_pole, s_omega, s_dens = sup
    r_super_plate = plate_to_super[r_plate]
    seed = seed32
    n = g.n_cells
    npad = g.n_padded
    dt = 1e-2 / max(1.0, math.sqrt(n / 10000.0))
    undul_oct = 2 if n > 200000 else 3
    warp_oct = 2 if n > 200000 else 3
    sf_res = math.sqrt(n / 10000.0)
    noise_t = nt["base"]
    spread = p.spread

    small = find_collisions(g, r_plate, plate_is_ocean, plate_pole,
                            plate_omega, plate_density, noise_t, dt, undul_oct)
    sup_c = find_collisions(g, r_super_plate, s_ocean, s_pole,
                            s_omega, s_dens, noise_t, dt, undul_oct)
    col = A._blend_collisions(small, sup_c)
    live(col.stress, col.subduct, col.btype, col.mountain, col.coastline,
         col.ocean, col.has_ocean, col.both_ocean)
    if stage == "col":
        return done()

    base_decay = 0.5 + spread * 0.04
    decay = base_decay ** (1 / sf_res)
    sub_decay = (base_decay * 0.45) ** (1 / sf_res)
    num_passes = max(1, round(spread * 3 * sf_res))
    if stage == "stress1":          # single-pass variant: isolates fixed
        num_passes = 1              # overhead from per-pass loop cost
    gate_small = band_gate(r_plate, g.band_off, g.band_mask)
    rgate_small = rem_gate_eq(r_plate, g.rem_src, g.rem_dst)
    gate_sup = band_gate(r_super_plate, g.band_off, g.band_mask)
    rgate_sup = rem_gate_eq(r_super_plate, g.rem_src, g.rem_dst)
    if stage == "stressb":   # barrier variant: pin gates as materialized
        gate_small, gate_sup, rgate_small, rgate_sup = \
            jax.lax.optimization_barrier(
                (gate_small, gate_sup, rgate_small, rgate_sup))
    st2, sf2 = propagate_stress_banded(
        jnp.stack([small.stress, sup_c.stress], 1),
        jnp.stack([small.subduct, sup_c.subduct], 1),
        (gate_small, gate_sup),
        jnp.stack([rgate_small, rgate_sup], 1),
        jnp.stack([plate_is_ocean[r_plate], s_ocean[r_super_plate]], 1),
        *g.bands, decay, sub_decay, num_passes)
    stress, subduct = A._blend_propagated(
        st2[:, 0], sf2[:, 0], st2[:, 1], sf2[:, 1], col.subduct)
    live(stress, subduct)
    if stage in ("stress", "stress1", "stressb"):
        return done()

    mountain, coastline, ocean_seeds = col.mountain, col.coastline, col.ocean
    in_any = mountain | coastline | ocean_seeds
    ocean_seeds, coastline = A._plate_reps(
        r_plate, in_any, g.valid, plate_is_ocean, coastline,
        ocean_seeds, num_plates=int(plate_is_ocean.shape[0]))
    stress_mountain = mountain & (subduct < 0.55)
    stop_r = stress_mountain | coastline | ocean_seeds
    idx = jnp.arange(npad, dtype=jnp.int32)

    def rand_cost(k):
        return 0.5 + hash01(idx, seed + k)

    r_is_ocean = plate_is_ocean[r_plate] & g.valid
    land_mask = (~r_is_ocean) & g.valid
    land_nb_cnt = banded_sum(land_mask.astype(jnp.float32), *g.bands)
    ocean_nb_cnt = banded_sum(r_is_ocean.astype(jnp.float32), *g.bands)
    coast_seeds = r_is_ocean & (land_nb_cnt > 0)
    no_barrier = jnp.zeros(npad, bool)
    land_coast_seeds = land_mask & (ocean_nb_cnt > 0)
    dists = bfs_hops_multi_banded(
        jnp.stack([stress_mountain, ocean_seeds, coastline, coast_seeds,
                   land_coast_seeds], 1),
        jnp.stack([ocean_seeds, coastline, stop_r, no_barrier,
                   r_is_ocean], 1),
        *g.bands,
        rand_cost=jnp.stack([rand_cost(k) for k in range(1, 6)], 1))
    live(jnp.where(jnp.isinf(dists), 0.0, dists))
    if stage == "dists":
        return done()

    dist_mountain = dists[:, 0]
    dist_ocean = dists[:, 1]
    dist_coastline = dists[:, 2]
    dist_coast = dists[:, 3]
    dist_coast_land = dists[:, 4]
    max_stress = A._stress_p97(stress, g.valid)

    interior_band = max(4, round(16 * sf_res))
    tectonic_reach = max(6, round(20 * sf_res))
    plateau_start = max(2, round(3 * sf_res))
    rift_half = max(2, round(4 * sf_res))
    floor_end = max(1, round(1.5 * sf_res))
    shoulder_end = max(2, round(2.5 * sf_res))
    ridge_half = max(2, round(4 * sf_res))
    fracture_half = max(2, round(3 * sf_res))
    ba_start = max(1, round(2 * sf_res))
    ba_peak = max(2, round(3 * sf_res))
    ba_end = max(3, round(5 * sf_res))
    max_cd = max(8, round(8 * sf_res))
    max_arc = max(5, round(5 * sf_res))

    coast_bdry = jnp.where(r_is_ocean, land_nb_cnt > 0,
                           ocean_nb_cnt > 0) & g.valid
    stress_n = jnp.minimum(1.0, stress / max_stress)
    carried0 = jnp.stack([
        jnp.where(coast_bdry, stress_n, 0.0),
        jnp.where(coast_bdry, subduct, 0.0),
        jnp.where(coast_bdry, (col.btype == 1).astype(jnp.float32), 0.0),
    ])
    d_bdry2, _, carried = band_bfs_banded(
        coast_bdry[:, None], carried0[:, :, None], *g.bands,
        max_hops=max_cd, tie=carried0[0][:, None], num_carry=3)
    d_bdry = jnp.where(jnp.isinf(d_bdry2[:, 0]), max_cd + 1.0, d_bdry2[:, 0])
    coast_stress, coast_subduct, coast_convergent = (
        carried[0, :, 0], carried[1, :, 0], carried[2, :, 0])
    live(d_bdry, coast_stress, coast_subduct, coast_convergent)
    if stage == "carry":
        return done()

    rift_seeds = (col.btype == 2) & (~col.has_ocean) & g.valid
    ridge_seeds = (col.btype == 2) & col.both_ocean & g.valid
    frac_seeds = (col.btype == 3) & col.both_ocean & g.valid
    ba_seeds = (col.btype == 1) & col.has_ocean & (subduct < 0.50) & g.valid
    arc_seeds = (col.btype == 1) & col.both_ocean & (subduct < 0.45) & g.valid
    all_cells = jnp.ones(npad, bool)
    zero = jnp.zeros(npad, jnp.float32)
    band_hops = max(rift_half, ridge_half, fracture_half, ba_end, max_arc)
    use_gate5 = np.asarray([True, False, False, True, True])
    rgate5 = jnp.where(use_gate5[None, :], rgate_small[:, None], True)
    band_dist, _, band_carry = band_bfs_banded(
        jnp.stack([rift_seeds, ridge_seeds, frac_seeds, ba_seeds,
                   arc_seeds], 1),
        jnp.stack([zero, zero, zero,
                   jnp.where(ba_seeds, stress_n, 0.0),
                   jnp.where(arc_seeds, stress_n, 0.0)], 1)[None],
        *g.bands, max_hops=band_hops,
        hops_cap=np.asarray([rift_half, ridge_half, fracture_half,
                             ba_end, max_arc], np.int32),
        allow=jnp.stack([land_mask, r_is_ocean, r_is_ocean, all_cells,
                         r_is_ocean], 1),
        gate_mix=(gate_small, use_gate5), rem_gate=rgate5,
        num_carry=1)
    live(jnp.where(jnp.isinf(band_dist), 0.0, band_dist),
         band_carry[0])
    if stage == "bands":
        return done()

    rift_dist = band_dist[:, 0]
    ridge_dist = band_dist[:, 1]
    fracture_dist = band_dist[:, 2]
    backarc_dist = band_dist[:, 3]
    backarc_stress = band_carry[0, :, 3]
    arc_dist = band_dist[:, 4]
    arc_stress = band_carry[0, :, 4]

    elev, debug = A._main_assembly(
        g.pos, r_is_ocean, stress, subduct, col.btype,
        dist_mountain, dist_ocean, dist_coastline, dist_coast,
        dist_coast_land,
        rift_dist, ridge_dist, fracture_dist, backarc_dist, backarc_stress,
        max_stress, plate_pole[r_plate],
        noise_t, nt["rift"], nt["fold"], jnp.float32(p.roughness),
        warp_oct, interior_band, tectonic_reach, plateau_start,
        rift_half, floor_end, shoulder_end, ridge_half, fracture_half,
        ba_start, ba_peak, ba_end)
    live(elev)
    if stage == "assembly":
        return done()

    elev, dl_coastal = A._coastal_roughening(
        g.pos, elev, r_is_ocean, stress, max_stress,
        d_bdry, coast_stress, coast_subduct, coast_convergent,
        nt["c1"], nt["c2"], nt["c3"],
        noise_t, jnp.float32(p.roughness),
        coast_roughen_dist=max_cd, island_band=max(4, round(4 * sf_res)))
    live(elev, dl_coastal)
    if stage == "coastal":
        return done()

    elev, dl_arc = A._island_arcs(
        g.pos, elev, arc_dist, arc_stress, nt["arc"],
        peak_dist=max(1.5, 1.5 * sf_res), sigma=max(1.5, 1.5 * sf_res),
        max_arc_dist=max_arc)
    live(elev, dl_arc)
    if stage == "arcs":
        return done()

    hs = hotspot_uplift(g.pos, domes, nt["hs1"], nt["hs2"])
    live(hs)
    return done()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 204_000
    stages = sys.argv[2:] or STAGES
    prime_device_transfer()
    params = GenerationParams(seed=42, n_cells=n, skip_climate=True)
    s = host_setup(params)
    print(f"n={n} host_setup done", flush=True)
    prev = 0.0
    for stage in stages:
        fn = jax.jit(functools.partial(_run_prefix, stage, s.spec))
        t0 = time.perf_counter()
        out = fn(*s.args)
        jax.block_until_ready(out)
        t_cold = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn(*s.args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{stage:9s} cold={t_cold:7.1f}s warm={best:7.3f}s "
              f"delta={best - prev:7.3f}s", flush=True)
        prev = best


if __name__ == "__main__":
    main()
