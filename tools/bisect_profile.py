"""Device-time bisection of the fused pipeline on real hardware.

jax.profiler traces are impractical over the tunneled backend, and the
staged engine would pay ~40 separate remote compiles. Instead: compile a
handful of TRUNCATED fused programs (each a prefix of pipeline/fused.py
``_pipeline``) and difference their warm wall-clocks — full-fusion-fidelity
stage times for the cost of a few cached compiles.

    python tools/bisect_profile.py [n_cells] [stage ...]

Stages: proj elev post wind ocean precip full (default: all).
"""

import os
import sys
import time

if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses  # noqa: E402
import math  # noqa: E402
import functools  # noqa: E402

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import planet_heightmap_generation_tpu  # noqa: E402  (enables compile cache)
from planet_heightmap_generation_tpu.config import GenerationParams  # noqa: E402
from planet_heightmap_generation_tpu.pipeline.engine import (  # noqa: E402
    host_setup, prime_device_transfer)
from planet_heightmap_generation_tpu.pipeline import fused as F  # noqa: E402


def _prefix(stage):
    """A traced function running the _pipeline prefix up to ``stage``."""

    def run(spec, g, proj, plate, sup, domes, nt, warp_t, climate_t,
            triangles, seed32):
        from planet_heightmap_generation_tpu.tectonics.coarse import (
            _project_kernel)
        from planet_heightmap_generation_tpu.ops.noise import _GRAD_J
        from planet_heightmap_generation_tpu.elevation import assign_elevation
        from planet_heightmap_generation_tpu.erosion import run_post_processing
        from planet_heightmap_generation_tpu.climate import (
            compute_wind, compute_ocean_currents, compute_precipitation,
            compute_temperature)
        from planet_heightmap_generation_tpu.climate.wind import (
            climate_coast_fields)

        perm, pm12, perturb_amp, bins_idx, bins_mask, bins_points, \
            coarse_plate = proj
        r_plate = _project_kernel(
            g.pos, perm, pm12, _GRAD_J, perturb_amp,
            bins_idx, bins_mask, bins_points, coarse_plate,
            spec.n_lat, spec.n_lon)
        r_plate = F.smooth_and_reconnect(g, r_plate, spec.num_plates, 3)
        if stage == "proj":
            return r_plate

        p = spec.params
        p_ocean, p_pole, p_omega, p_dens = plate
        kw = {}
        if spec.has_super:
            plate_to_super, s_ocean, s_pole, s_omega, s_dens = sup
            kw = dict(r_super_plate=plate_to_super[r_plate],
                      super_is_ocean=s_ocean, super_pole=s_pole,
                      super_omega=s_omega, super_density=s_dens)
        # sub-stage truncations INSIDE assign_elevation (4M fault bisect):
        # stress -> bfs5 -> carry -> assembly -> coastal -> (full) elev
        elev_trunc = stage if stage in ("stress", "bfs5", "carry",
                                        "assembly", "coastal") else None
        elev_res = assign_elevation(
            g, r_plate, p_ocean, p_pole, p_omega, p_dens,
            seed=seed32, noise_mag=p.roughness, spread=p.spread,
            noise_pack=nt, domes=domes if spec.has_domes else {},
            trunc=elev_trunc, **kw)
        if stage == "elev" or elev_trunc is not None:
            return elev_res.elevation

        avg_edge_nom = math.pi / math.sqrt(g.n_cells)

        # post sub-stages (the erosion composite dominates 1M wall-clock —
        # VERDICT r2 weak #1): warp -> smooth -> flood -> 1 erosion iter ->
        # full post. Each is a true prefix of run_post_processing.
        if stage in ("warp", "smooth", "flood", "iter1"):
            from planet_heightmap_generation_tpu.erosion.warp import (
                warp_terrain)
            from planet_heightmap_generation_tpu.erosion.smooth import (
                smooth_elevation)
            from planet_heightmap_generation_tpu.erosion.flood import (
                priority_flood_carve)
            from planet_heightmap_generation_tpu.erosion.composite import (
                erode_composite)
            import jax.numpy as jnp
            e = elev_res.elevation
            tw = p.terrain_warp
            max_amp = 0.12 * tw
            max_steps = int(math.ceil(max_amp / max(avg_edge_nom, 1e-6))) + 8
            hot = elev_res.debug.get("hotspot")
            e = warp_terrain(e, g.pos, g.valid, *g.bands, noise_t=warp_t,
                             strength=jnp.float32(tw), hotspot=hot,
                             max_steps=max_steps)
            if stage == "warp":
                return e
            is_ocean = (e <= 0) & g.valid
            iters = round(1 + p.smoothing * 4)
            e = smooth_elevation(e, is_ocean, g.valid, *g.bands, iters,
                                 jnp.float32(0.2 + p.smoothing * 0.5))
            if stage == "smooth":
                return e
            ef, _, _ = priority_flood_carve(e, is_ocean, g.valid, *g.bands,
                                            jnp.float32(0.5))
            if stage == "flood":
                return ef
            # one composite iteration (glacial+hydraulic+thermal shares)
            e1 = erode_composite(
                g, e, is_ocean, h_iters=1, k_coeff=p.hydraulic_erosion
                * 0.0006, m_exp=0.5, dt=1.0, t_iters=1,
                talus_slope=1.2 - p.thermal_erosion * 0.4,
                k_thermal=p.thermal_erosion * 0.15,
                g_iters=1 if p.glacial_erosion > 0 else 0,
                glacial_strength=p.glacial_erosion)
            return e1

        elevation, _ = run_post_processing(
            g, elev_res.elevation, 0, dataclasses.asdict(p),
            hotspot=elev_res.debug.get("hotspot"),
            avg_edge=avg_edge_nom, warp_t=warp_t)
        if stage == "post":
            return elevation

        d5, aux = climate_coast_fields(g, elevation, p_ocean, r_plate)
        wind = compute_wind(g, elevation, p_ocean, r_plate, climate_t,
                            coast_d=d5[:, :2], gf=aux["gf"],
                            is_land=aux["is_land"],
                            plate_land=aux["plate_land"])
        if stage == "wind":
            return wind["r_wind_speed_summer"]
        ocean = compute_ocean_currents(g, elevation, wind, coast_d=d5[:, 2:])
        if stage == "ocean":
            return ocean["r_ocean_speed_summer"]
        precip = compute_precipitation(
            g, elevation, wind, ocean, p.precipitation_offset,
            p.land_coverage)
        if stage == "precip":
            return precip["r_precip_summer"]
        temp = compute_temperature(
            g, elevation, wind, ocean, precip, p.temperature_offset)
        return temp["r_temperature_summer"]

    return run


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 204_000
    stages = sys.argv[2:] or ["proj", "elev", "post", "wind", "ocean",
                              "precip", "full"]
    prime_device_transfer()
    params = GenerationParams(seed=42, n_cells=n, skip_climate=False)
    s = host_setup(params)
    print(f"n={n} host_setup done", flush=True)

    prev = 0.0
    for stage in stages:
        if stage == "full":
            fn = jax.jit(functools.partial(F._pipeline, s.spec))
        else:
            fn = jax.jit(functools.partial(_prefix(stage), s.spec))
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
        print(f"{stage:7s} cold={t_cold:7.1f}s warm={best:7.3f}s "
              f"delta={best - prev:7.3f}s", flush=True)
        prev = best


if __name__ == "__main__":
    main()
