"""Benchmark harness — full planet generation wall-clock on real hardware.

Emits ONE JSON line per completed config, cheapest config first, flushed
immediately — so a driver timeout still leaves the best number that fit in
the budget on stdout (the last line is the headline). Schema per line:
{"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md) — vs_baseline is
an ANCHOR, not a measurement: we anchor the browser at 5 s for the 204K
default (its own V1 review observed it "locks for multiple seconds" at
200K+, reference V1_REVIEW.md:26) and scale linearly with cell count, so
vs_baseline = 5*(N/204000) / wall (higher is better). The honest headline
numbers are the wall-clock seconds and cells/s values themselves. The
16-seed sweep anchor is 16 sequential reference runs at ~30 s each @4M.

Cold-start note: the repo ships a prewarmed persistent XLA compile cache
(.jax_cache/, committed) keyed on the HLO of each fused program — a fresh
checkout's first run deserializes instead of paying the 2-8 min remote
compile per config. bench.py re-execs with PYTHONHASHSEED=0 so the traced
HLO (and so the cache key) is process-stable.

Configs (BASELINE.json ladder), run in this order until the budget is spent:
  1: 40K cells, plates + ocean/land + base elevation, erosion off
  d: 204K default planet, full erosion + climate (the reference default)
  2: 160K + full erosion stack (no climate)
  3: 640K + glacial (no climate)
  4: 1M + full climate
  5: 4M x 16-seed batched sweep + 8K equirect heightmap export

Env knobs: BENCH_CONFIG=1|2|3|4|5|d (run just one config),
BENCH_BUDGET_S (default 540), BENCH_SEED, BENCH_N (override default-config N).
"""

import json
import os
import sys
import time

# Pin string-hash iteration order before anything imports jax: the fused
# pipeline's HLO (and so the persistent compile-cache key) must be identical
# across processes, or every driver run pays a full cold compile.
if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

T_START = time.monotonic()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 540))


def _remaining():
    return BUDGET_S - (time.monotonic() - T_START)


def _emit(metric, value, unit, vs_baseline):
    print(json.dumps({"metric": metric, "value": value, "unit": unit,
                      "vs_baseline": vs_baseline}), flush=True)


def _params_for(cfg, seed):
    from planet_heightmap_generation_tpu.config import GenerationParams

    if cfg == "1":
        return GenerationParams(seed=seed, n_cells=40_000, skip_climate=True,
                                smoothing=0.0, glacial_erosion=0.0,
                                hydraulic_erosion=0.0, thermal_erosion=0.0,
                                ridge_sharpening=0.0, terrain_warp=0.0)
    if cfg == "d":
        n = int(os.environ.get("BENCH_N", 204_000))
        return GenerationParams(seed=seed, n_cells=n, skip_climate=False)
    if cfg == "2":
        return GenerationParams(seed=seed, n_cells=160_000, skip_climate=True)
    if cfg == "3":
        return GenerationParams(seed=seed, n_cells=640_000, skip_climate=True,
                                glacial_erosion=0.5)
    if cfg == "4":
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
    t1 = time.perf_counter()
    d = r.diagnostics()  # device->host sync (host read of final arrays)
    assert d["nan_count"] == 0, f"NaNs in elevation: {d}"
    t2 = time.perf_counter()
    # phase breakdown on stderr (never pollutes the JSON stdout contract):
    # where cold time goes — host prologue stages vs the device program
    # (trace+lower+compile-or-deserialize+execute) vs the result fetch
    stages = "; ".join(f"{name}={ms / 1000:.1f}s"
                       for name, ms in r.timing.stages)
    print(f"[bench trace] n={params.n_cells} total={t2 - t0:.1f}s "
          f"fetch={t2 - t1:.1f}s | {stages}", file=sys.stderr, flush=True)
    return time.perf_counter() - t0, r


def _vs_baseline(n_cells, wall):
    return round(5.0 * (n_cells / 204_000) / wall, 2)


def _bench_config(engine, cfg, seed):
    """Cold run -> emit *_cold line; warm run -> emit headline line.
    Returns the warm wall time (or cold if no budget for warm)."""
    params = _params_for(cfg, seed)
    n = params.n_cells
    tag = "default" if cfg == "d" else f"config{cfg}"
    cold, r = _run_once(engine, params)
    _emit(f"{tag}_wall_s_{n // 1000}k_cold", round(cold, 3), "s",
          _vs_baseline(n, cold))
    # warm run: same shapes, different seed -> jit cache hot
    if _remaining() < cold * 0.7 + 10:
        return cold
    wall, r = _run_once(engine, params.replace(seed=seed + 1))
    if not (params.hydraulic_erosion == 0 and params.thermal_erosion == 0
            and params.glacial_erosion == 0):
        # the BASELINE named metric: cells/sec with the erosion stack on
        _emit(f"{tag}_cells_per_s", round(n / wall), "cells/s",
              round((n / wall) / 1_000_000, 2))
    _emit(f"{tag}_wall_s_{n // 1000}k", round(wall, 3), "s",
          _vs_baseline(n, wall))
    return wall


def _bench_sweep(engine, seed):
    """Config 5: S-seed sweep at 4M cells + one 8K heightmap export.

    S adapts to the remaining budget (BASELINE asks for 16; a smaller
    real number beats none — the metric NAME carries the measured count,
    e.g. sweep4_4m_cells_per_s). The warmup run also measures the
    per-seed wall used for the fit."""
    import numpy as np
    from planet_heightmap_generation_tpu.config import GenerationParams
    from planet_heightmap_generation_tpu.parallel.batch import generate_batch
    from planet_heightmap_generation_tpu.api.export import export_map
    from planet_heightmap_generation_tpu.mesh.device import to_device

    params = GenerationParams(seed=seed, n_cells=4_000_000, skip_climate=True)
    _run_once(engine, params)  # warmup/compile at the 4M shapes
    engine.reset()  # release the retained 4M planet's device buffers
    if _remaining() < 40:
        return
    # one measured lean seed FIRST: config 5 always emits a real number,
    # and the warm per-seed wall sizes the bigger sweep (the warmup wall
    # is cold-compile-inflated and useless for the fit)
    t0 = time.perf_counter()
    generate_batch(params, [seed + 1], engine=engine, lean=True)
    per_seed = time.perf_counter() - t0
    _emit("sweep1_4m_cells_per_s", round(4_000_000 / per_seed), "cells/s",
          round(30.0 / per_seed, 2))
    n_sweep = int(min(15, (_remaining() - 90) // max(per_seed, 1.0)))
    if n_sweep < 2:
        return
    t0 = time.perf_counter()
    results = generate_batch(params, list(range(seed + 2, seed + 2 + n_sweep)),
                             engine=engine, lean=True)
    img = export_map(to_device(results[-1].graph), results[-1].elevation,
                     "heightmap", height=4096, width=8192)
    assert np.isfinite(img).all()
    wall = time.perf_counter() - t0
    _emit(f"sweep{n_sweep}_4m_cells_per_s",
          round(n_sweep * 4_000_000 / wall), "cells/s",
          round((n_sweep * 30.0) / wall, 2))


def main():
    only = os.environ.get("BENCH_CONFIG", "").strip()
    seed = int(os.environ.get("BENCH_SEED", 42))

    from planet_heightmap_generation_tpu.pipeline import PlanetEngine

    engine = PlanetEngine()

    if only:
        if only == "5":
            _bench_sweep(engine, seed)
        else:
            _bench_config(engine, only, seed)
        return

    # Ladder: cheapest first; each config emits as soon as it completes.
    # Before each rung, require enough remaining budget (scaled estimate
    # from the previous rung's cold time, x2 for cold compile of new shapes).
    last_wall = None
    last_n = None
    for cfg in ("1", "d", "2", "3", "4"):
        params = _params_for(cfg, seed)
        if last_wall is not None:
            est = last_wall * (params.n_cells / last_n) * 2.0 + 20
            if _remaining() < est:
                break
        elif _remaining() < 30:
            break
        try:
            last_wall = _bench_config(engine, cfg, seed)
            last_n = params.n_cells
        except Exception as e:  # keep earlier lines on stdout
            print(f"bench config {cfg} failed: {e!r}", file=sys.stderr)
            break
    # config 5 adapts its seed count to whatever budget is left; even a
    # 1-seed 4M number beats none (VERDICT r2 #4) — require only enough
    # room for the 4M warmup (~2x the 1M cold) plus one measured seed.
    if last_wall is not None and _remaining() > last_wall * 3 + 90:
        try:
            _bench_sweep(engine, seed)
        except Exception as e:
            print(f"bench sweep failed: {e!r}", file=sys.stderr)


if __name__ == "__main__":
    main()
