"""Per-sub-kernel warm profile of elevation + terrain post at a given N.

Same monkey-patch technique as profile_climate.py: wrap the module-level
jitted kernels with block_until_ready timers, run the STAGED engine twice,
print the warm table. Usage:

    PYTHONHASHSEED=0 python tools/profile_terrain.py [n_cells=1000000]
"""

import os
import sys
import time
from collections import defaultdict

if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIMES = defaultdict(float)
COUNTS = defaultdict(int)
ACTIVE = []


def wrap(mod, name, label=None):
    import jax
    fn = getattr(mod, name)
    lab = label or name

    def f(*a, **k):
        if ACTIVE:
            return fn(*a, **k)
        ACTIVE.append(lab)
        t0 = time.perf_counter()
        try:
            r = fn(*a, **k)
            jax.block_until_ready(r)
        finally:
            ACTIVE.pop()
        TIMES[lab] += time.perf_counter() - t0
        COUNTS[lab] += 1
        return r
    setattr(mod, name, f)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    import jax
    from planet_heightmap_generation_tpu.config import GenerationParams
    from planet_heightmap_generation_tpu.pipeline import PlanetEngine
    import planet_heightmap_generation_tpu.elevation.assemble as A
    import planet_heightmap_generation_tpu.elevation.collisions as C
    import planet_heightmap_generation_tpu.elevation.hotspots as H
    import planet_heightmap_generation_tpu.erosion.composite as EC
    import planet_heightmap_generation_tpu.erosion.flood as EF
    import planet_heightmap_generation_tpu.erosion.warp as EW
    import planet_heightmap_generation_tpu.erosion.smooth as ES
    import planet_heightmap_generation_tpu.erosion.glacial as EG
    import planet_heightmap_generation_tpu.pipeline.engine as PE

    for name in ("_blend_collisions", "_main_assembly", "_coastal_roughening",
                 "_island_arcs", "_plate_reps", "_stress_p97"):
        wrap(A, name)
    # assemble.py imports these into ITS namespace — wrap there, else their
    # cost lands on the next wrapped call
    for name in ("find_collisions", "propagate_stress", "hotspot_uplift",
                 "carry_bfs_banded", "bfs_hops_banded"):
        if hasattr(A, name):
            wrap(A, name, f"A.{name}")
    for name in ("find_collisions", "propagate_stress"):
        wrap(C, name)
    wrap(H, "hotspot_uplift")
    if hasattr(A, "bfs_hops_multi_banded"):
        wrap(A, "bfs_hops_multi_banded", "A.bfs_multi(dist fields)")
    # erosion pieces
    wrap(EF, "open_ocean_mask")
    wrap(EF, "_epsilon_fill")
    wrap(EF, "downstream_accumulate")
    wrap(EF, "monotonic_enforce")
    for name in ("steepest_receivers", "flow_accumulation",
                 "stream_power_solve", "thermal_step", "glacial_step"):
        if hasattr(EC, name):
            wrap(EC, name)
    wrap(EW, "warp_terrain")
    for name in ("smooth_elevation", "sharpen_ridges", "apply_soil_creep"):
        wrap(ES, name)
    wrap(EG, "glacial_post_smooth")
    # projection/smoothing stage pieces
    import planet_heightmap_generation_tpu.ops.graph as OG
    wrap(OG, "majority_smooth")
    import planet_heightmap_generation_tpu.ops.banded as OB
    wrap(OB, "connected_components_gated")
    wrap(OB, "flood_assign_banded")
    if hasattr(PE, "project_coarse_plates"):
        wrap(PE, "project_coarse_plates")

    eng = PlanetEngine(timing=True)
    p = GenerationParams(seed=42, n_cells=n, skip_climate=True)
    t0 = time.perf_counter()
    r = eng.generate(p)
    jax.block_until_ready(r.elevation)
    print(f"run 0 (cold): {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    TIMES.clear()
    COUNTS.clear()

    t0 = time.perf_counter()
    r = eng.generate(p.replace(seed=43))
    jax.block_until_ready(r.elevation)
    total = time.perf_counter() - t0
    print(f"run 1 (warm): {total:.1f}s")
    for name, ms in r.timing.stages:
        if ms > 50:
            print(f"  stage {name}: {ms / 1000:.2f}s")
    print("terrain sub-kernels (warm):")
    for k in sorted(TIMES, key=lambda k: -TIMES[k]):
        print(f"  {k:32s} {TIMES[k]:7.3f}s  x{COUNTS[k]}")


if __name__ == "__main__":
    main()
