"""Per-sub-kernel warm profile of the climate stack at a given N.

Wraps each module-level jitted climate kernel with a block_until_ready
timer (functions are looked up through module globals at call time, so
monkey-patched wrappers are hit), runs terrain once (staged, cached),
then climate twice and prints the warm per-kernel table. Usage:

    PYTHONHASHSEED=0 python tools/profile_climate.py [n_cells=1000000]
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
ACTIVE = []  # wrapper re-entrancy guard (outer composites call inner ones)


def wrap(mod, name, label=None):
    import jax
    fn = getattr(mod, name)
    lab = label or name

    def f(*a, **k):
        if ACTIVE:  # only attribute to the outermost wrapped call
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
    import planet_heightmap_generation_tpu.climate.precipitation as P
    import planet_heightmap_generation_tpu.climate.wind as W
    import planet_heightmap_generation_tpu.climate.ocean_currents as O
    import planet_heightmap_generation_tpu.climate.temperature as T
    import planet_heightmap_generation_tpu.climate.heuristic_precip as H
    import planet_heightmap_generation_tpu.ops.banded as B

    for name in ("_wind_convergence2", "_advect_moisture2", "_mechanisms2",
                 "_rain_shadow2"):
        wrap(P, name)
    # smooth/gradient helpers as used inside precipitation
    for name in ("smooth_field_banded", "compute_gradients_banded"):
        if hasattr(P, name):
            wrap(P, name, f"P.{name}")
    wrap(H, "heuristic_precip_raw")
    wrap(H, "west_coast_signal")
    wrap(H, "heuristic_wind_field")
    for name in ("_bin_aggregates", "_pressure_kernel", "_pressure_to_wind",
                 "climate_coast_fields"):
        wrap(W, name)
    if hasattr(W, "smooth_field_banded"):
        wrap(W, "smooth_field_banded", "W.smooth_field_banded")
    for name in ("_coast_classification", "_circumpolar", "_season_vectors",
                 "_classify_warmth"):
        wrap(O, name)
    if hasattr(O, "smooth_field_banded"):
        wrap(O, "smooth_field_banded", "O.smooth_field_banded")
    if hasattr(O, "smooth_masked_banded"):
        wrap(O, "smooth_masked_banded", "O.smooth_masked_banded")
    wrap(T, "_diffuse_ocean_warmth")
    wrap(T, "_temperature_kernel")
    if hasattr(T, "smooth_field_banded"):
        wrap(T, "smooth_field_banded", "T.smooth_field_banded")

    eng = PlanetEngine(timing=True)
    p = GenerationParams(seed=42, n_cells=n, skip_climate=False)
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
    print("climate sub-kernels (warm):")
    for k in sorted(TIMES, key=lambda k: -TIMES[k]):
        print(f"  {k:32s} {TIMES[k]:7.3f}s  x{COUNTS[k]}")


if __name__ == "__main__":
    main()
