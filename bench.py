"""Benchmark harness — full planet generation wall-clock on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Default config: the reference's default planet (204K cells, 80 plates,
4 continents, full erosion + climate). The reference publishes no numbers;
its own V1 review observed the browser "locks for multiple seconds" at 200K+
cells (reference V1_REVIEW.md:26) — we take 5 s as a conservative baseline
for the default config, so vs_baseline = 5 / wall_s (higher is better).

BASELINE.json config selection via BENCH_CONFIG=1..5:
  1: 40K cells, plates + ocean/land + base elevation, erosion off
  2: 160K + full erosion stack (no climate)
  3: 640K + glacial/coastal/hotspots (no climate)
  4: 1M + full climate
  5: 4M × 16-seed batched sweep + 8K equirect heightmap export
Other env overrides: BENCH_N (cells), BENCH_SEED, BENCH_SKIP_CLIMATE=1.
"""

import json
import os
import time


def _params_for_config(cfg: int, seed: int):
    from planet_heightmap_generation_tpu.config import GenerationParams

    if cfg == 1:
        return GenerationParams(seed=seed, n_cells=40_000, skip_climate=True,
                                smoothing=0.0, glacial_erosion=0.0,
                                hydraulic_erosion=0.0, thermal_erosion=0.0,
                                ridge_sharpening=0.0, terrain_warp=0.0)
    if cfg == 2:
        return GenerationParams(seed=seed, n_cells=160_000, skip_climate=True)
    if cfg == 3:
        return GenerationParams(seed=seed, n_cells=640_000, skip_climate=True,
                                glacial_erosion=0.5)
    if cfg == 4:
        return GenerationParams(seed=seed, n_cells=1_000_000,
                                skip_climate=False)
    raise ValueError(cfg)


def _run_once(engine, params):
    import jax

    t0 = time.perf_counter()
    r = engine.generate(params)
    jax.block_until_ready(r.elevation)
    if r.climate is not None:
        jax.block_until_ready(r.climate["koppen"])
    # force a real device→host sync (block_until_ready alone can be a
    # no-op on the tunneled axon backend)
    d = r.diagnostics()
    return time.perf_counter() - t0, r, d


def main():
    cfg = int(os.environ.get("BENCH_CONFIG", "0"))
    seed = int(os.environ.get("BENCH_SEED", 42))

    from planet_heightmap_generation_tpu.config import GenerationParams
    from planet_heightmap_generation_tpu.pipeline import PlanetEngine

    engine = PlanetEngine()

    if cfg == 5:
        # 16-seed sweep at 4M cells with one 8K heightmap export
        from planet_heightmap_generation_tpu.parallel.batch import generate_batch
        from planet_heightmap_generation_tpu.api.export import export_map
        from planet_heightmap_generation_tpu.mesh.device import to_device
        import numpy as np

        params = GenerationParams(seed=seed, n_cells=4_000_000,
                                  skip_climate=True)
        _run_once(engine, params)  # warmup/compile
        t0 = time.perf_counter()
        results = generate_batch(params, list(range(seed, seed + 16)),
                                 engine=engine)
        img = export_map(to_device(results[-1].graph), results[-1].elevation,
                         "heightmap", height=4096, width=8192)
        assert np.isfinite(img).all()
        wall = time.perf_counter() - t0
        cells_per_s = 16 * 4_000_000 / wall
        print(json.dumps({
            "metric": "sweep16_4m_cells_per_s",
            "value": round(cells_per_s),
            "unit": "cells/s",
            # baseline: 16 sequential reference runs at ~30 s each for 4M
            "vs_baseline": round((16 * 30.0) / wall, 2),
        }))
        return

    if cfg in (1, 2, 3, 4):
        params = _params_for_config(cfg, seed)
        _run_once(engine, params)  # warmup: compile everything
        wall, r, diag = _run_once(engine, params.replace(seed=seed + 1))
        assert diag["nan_count"] == 0, f"NaNs in elevation: {diag}"
        print(json.dumps({
            "metric": f"config{cfg}_wall_s_{params.n_cells // 1000}k",
            "value": round(wall, 3),
            "unit": "s",
            "vs_baseline": round(5.0 * (params.n_cells / 204_000) / wall, 2),
        }))
        return

    # default: the reference's default planet
    n = int(os.environ.get("BENCH_N", 204_000))
    skip_climate = os.environ.get("BENCH_SKIP_CLIMATE", "0") == "1"
    params = GenerationParams(seed=seed, n_cells=n, skip_climate=skip_climate)

    _, _, diag = _run_once(engine, params)  # warmup: compile everything
    assert diag["nan_count"] == 0, f"NaNs in elevation: {diag}"

    # measured run (different seed → same shapes, jit cache hot)
    wall, r, diag = _run_once(engine, params.replace(seed=seed + 1))
    assert diag["nan_count"] == 0, f"NaNs in elevation: {diag}"

    baseline_s = 5.0  # browser "locks for multiple seconds" at 200K+ cells
    print(json.dumps({
        "metric": f"full_gen_wall_s_{n // 1000}k",
        "value": round(wall, 3),
        "unit": "s",
        "vs_baseline": round(baseline_s / wall, 2),
    }))


if __name__ == "__main__":
    main()
