"""Benchmark harness — full planet generation wall-clock on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Default config: the reference's default planet (204K cells, 80 plates,
4 continents, full erosion + climate). The reference publishes no numbers;
its own V1 review observed the browser "locks for multiple seconds" at 200K+
cells (reference V1_REVIEW.md:26) — we take 5 s as a conservative baseline
for the default config, so vs_baseline = 5 / wall_s (higher is better).

Env overrides: BENCH_N (cells), BENCH_SEED, BENCH_SKIP_CLIMATE=1.
"""

import json
import os
import sys
import time


def main():
    n = int(os.environ.get("BENCH_N", 204_000))
    seed = int(os.environ.get("BENCH_SEED", 42))
    skip_climate = os.environ.get("BENCH_SKIP_CLIMATE", "0") == "1"

    from planet_heightmap_generation_tpu.config import GenerationParams
    from planet_heightmap_generation_tpu.pipeline import PlanetEngine

    params = GenerationParams(seed=seed, n_cells=n, skip_climate=skip_climate)
    engine = PlanetEngine()

    # warmup: compile everything
    r = engine.generate(params)
    diag = r.diagnostics()
    assert diag["nan_count"] == 0, f"NaNs in elevation: {diag}"

    # measured run (different seed → same shapes, jit cache hot)
    t0 = time.perf_counter()
    r = engine.generate(params.replace(seed=seed + 1))
    import jax
    jax.block_until_ready(r.elevation)
    if r.climate is not None:
        jax.block_until_ready(r.climate["koppen"])
    wall = time.perf_counter() - t0

    baseline_s = 5.0  # browser "locks for multiple seconds" at 200K+ cells
    print(json.dumps({
        "metric": f"full_gen_wall_s_{n // 1000}k",
        "value": round(wall, 3),
        "unit": "s",
        "vs_baseline": round(baseline_s / wall, 2),
    }))


if __name__ == "__main__":
    main()
