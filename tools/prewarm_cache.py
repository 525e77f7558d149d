"""Rebuild the committed XLA compile cache from scratch.

The persistent cache (.jax_cache/, committed) converts the driver's cold
starts from multi-minute remote compiles into deserializes. Any
HLO-affecting change invalidates entries silently, so after a round of
kernel work the cache accumulates dead blobs (the round-2 advisor
finding) and misses the new programs. This tool regenerates it:

    python tools/prewarm_cache.py [--wipe] [--verify] [configs...]

--wipe removes every existing entry first (prune superseded blobs before
committing). Configs default to the full bench ladder (1 d 2 3 4 5w) plus
the 8K verify shape; `5w` compiles the 4M terrain program (one warmup
generate) without running the 16-seed sweep.

--verify re-runs each config in a FRESH subprocess afterward and FAILS
(rc=1) if any run adds a new cache entry — proof the snapshot covers every
program a driver bench run will trace. Round 4 shipped a cache regenerated
before the last HLO-affecting commit; config2 then MISSed in the driver
run and the recompile ate the remaining bench budget (VERDICT r4 #3).
Run --verify before EVERY snapshot.

Each config runs in THIS process sequentially (cold compile → cache
write); expect ~5-15 min per new fused program over the tunneled backend.
"""

import os
import shutil
import sys
import time

if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".jax_cache")


def _entries():
    try:
        return set(os.listdir(CACHE))
    except OSError:
        return set()


def verify(configs):
    """Re-run each config in a fresh subprocess; fail on any new entry."""
    import subprocess
    ok = True
    for cfg in configs:
        pre = _entries()
        t0 = time.monotonic()
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", cfg],
            cwd=REPO)
        new = _entries() - pre
        # entries <1 MB are trivial eager-op programs around jax's 1 s
        # persistent-cache write threshold — a varying subset gets written
        # each run (load-dependent compile times), so only >1 MB programs
        # count as real prewarm gaps (same rule as bench.py cache delta)
        big = sorted(e.split("-")[0] for e in new
                     if os.path.getsize(os.path.join(CACHE, e)) > (1 << 20))
        dt = time.monotonic() - t0
        if r.returncode != 0:
            print(f"[verify] config {cfg}: subprocess rc={r.returncode} FAIL")
            ok = False
        elif big:
            print(f"[verify] config {cfg}: {len(big)} NEW real programs "
                  f"({', '.join(big)}) — prewarm INCOMPLETE ({dt:.0f}s)")
            ok = False
        elif new:
            print(f"[verify] config {cfg}: clean ({len(new)} sub-MB "
                  f"utility programs — threshold noise; {dt:.0f}s)",
                  flush=True)
        else:
            print(f"[verify] config {cfg}: clean deserialize, "
                  f"zero new entries ({dt:.0f}s)", flush=True)
    return ok


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--wipe" in sys.argv[1:]:
        if os.path.isdir(CACHE):
            for f in os.listdir(CACHE):
                os.remove(os.path.join(CACHE, f))
            print(f"wiped {CACHE}")

    configs = args or ["v", "1", "d", "2", "3", "4", "5w"]

    if "--verify" in sys.argv[1:]:
        raise SystemExit(0 if verify(configs) else 1)

    from planet_heightmap_generation_tpu.config import GenerationParams
    from planet_heightmap_generation_tpu.pipeline import PlanetEngine
    import jax

    engine = PlanetEngine()
    for cfg in configs:
        t0 = time.monotonic()
        if cfg == "v":
            p = GenerationParams(seed=42, n_cells=8000, n_plates=16,
                                 num_continents=3)
        elif cfg == "1":
            p = GenerationParams(seed=42, n_cells=40_000, skip_climate=True,
                                 smoothing=0.0, glacial_erosion=0.0,
                                 hydraulic_erosion=0.0, thermal_erosion=0.0,
                                 ridge_sharpening=0.0, terrain_warp=0.0)
        elif cfg == "d":
            p = GenerationParams(seed=42, n_cells=204_000)
        elif cfg == "2":
            p = GenerationParams(seed=42, n_cells=160_000, skip_climate=True)
        elif cfg == "3":
            p = GenerationParams(seed=42, n_cells=640_000, skip_climate=True,
                                 glacial_erosion=0.5)
        elif cfg == "4":
            p = GenerationParams(seed=42, n_cells=1_000_000,
                                 skip_climate=False)
        elif cfg == "5w":
            p = GenerationParams(seed=42, n_cells=4_000_000,
                                 skip_climate=True)
        else:
            print(f"unknown config {cfg}", file=sys.stderr)
            continue
        r = engine.generate(p)
        jax.block_until_ready(r.elevation)
        assert r.diagnostics()["nan_count"] == 0
        if cfg == "5w":
            # bench config 5 also exports one 8K heightmap — compile the
            # rasterize + colorize programs at that shape now
            import numpy as np
            from planet_heightmap_generation_tpu.api.export import export_map
            from planet_heightmap_generation_tpu.mesh.device import to_device
            img = export_map(to_device(r.graph), r.elevation, "heightmap",
                             height=4096, width=8192)
            assert np.isfinite(img).all()
        engine.reset()
        size = sum(os.path.getsize(os.path.join(CACHE, f))
                   for f in os.listdir(CACHE)) if os.path.isdir(CACHE) else 0
        print(f"config {cfg}: {time.monotonic() - t0:.0f}s "
              f"(cache {size // (1 << 20)} MB)", flush=True)


if __name__ == "__main__":
    main()
