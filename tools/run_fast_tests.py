"""Fast-tier test runner — a few short-lived pytest processes.

One long-lived pytest process compiling hundreds of XLA:CPU kernels
intermittently dies in this jaxlib's CPU compiler (fatal abort deep into
the run — see tests/conftest.py); process isolation is the documented
mitigation. This runner splits the fast tier into groups chosen so each
process compiles one coherent kernel family (and the expensive session
fixtures are compiled exactly once, inside the single group that uses
them), runs each group in a fresh pytest subprocess, and aggregates the
tallies.

    python tools/run_fast_tests.py            # the fast tier, grouped
    python tools/run_fast_tests.py --list     # show the groups

Exit code: 0 iff every group passed. Per-group and total wall times are
printed so the tier's advertised runtime stays a measurement, not an
aspiration (tests/README.md records the latest numbers).
"""

import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Group -> test files. Keep each group's compile surface coherent:
#  - kernels: pure-host / tiny-kernel unit tests, no engine generate
#  - terrain: elevation/erosion/tectonics property tests (mid-size kernels)
#  - climate: the climate kernel family
#  - product: everything sharing the session-scoped canonical 4K generate
#    (conftest.canon_engine_result) — ONE staged compile set per process.
#    test_fused/test_reference_parity live HERE since r5: their staged
#    side IS the canonical fixture and every generate shares the 4K shape
#    family, so the former fused group's duplicate staged compile set
#    (~9 min) is gone and the only extra compiles are the fused terrain/
#    climate/post programs themselves.
#  - parallel: multi-device tests on the virtual 8-CPU mesh
GROUPS = [
    ("kernels", ["test_rng.py", "test_noise.py", "test_planet_code.py",
                 "test_mesh.py", "test_graph_ops.py", "test_banded.py",
                 "test_graph_multi.py", "test_native.py",
                 "test_reference_goldens.py", "test_sweep_pallas.py",
                 "test_bench_contract.py"]),
    ("terrain", ["test_erosion.py", "test_tectonics.py",
                 "test_elevation.py"]),
    ("climate", ["test_climate.py"]),
    ("product", ["test_pipeline.py", "test_layers_picking.py",
                 "test_overlays.py", "test_globe.py", "test_protocol.py",
                 "test_export_tiled.py", "test_fused.py",
                 "test_reference_parity.py"]),
    ("parallel", ["test_parallel.py"]),
]

# Measured on this 1-core host (2026-08-21, r5 layout, uncontended):
# kernels 2:26, terrain 5:00, climate 0:33, product(+fused+parity)
# 19:04, parallel 6:05 — 33:57 total, 185 passed (was ~54 min / 173
# tests in r4; the fused editRecompute equivalence moved to the slow
# tier and the duplicate staged compile set is gone). The floor is XLA:CPU compile
# time for the fused terrain+climate programs (~9 min — ONE HLO-pass-
# bound module; --xla_backend_optimization_level=1 does not help, nor
# does PLANET_BAND_COUNT=8: the cost is XLA passes on program structure)
# plus the staged kernel set (~9 min) — both irreducible without testing
# less. The 15-minute pre-commit check is the affected GROUP, not the
# full tier: every group but product runs in ≤6 min.

_TALLY = re.compile(
    r"(?:(\d+) passed)?(?:, )?(?:(\d+) failed)?(?:, )?"
    r"(?:(\d+) skipped)?(?:, )?(?:(\d+) deselected)?")


def main():
    if "--list" in sys.argv:
        for name, files in GROUPS:
            print(f"{name}: {' '.join(files)}")
        return 0

    listed = set()
    for _, files in GROUPS:
        listed.update(files)
    on_disk = {f for f in os.listdir(os.path.join(REPO, "tests"))
               if f.startswith("test_") and f.endswith(".py")}
    missing = sorted(on_disk - listed)
    if missing:
        print(f"ERROR: test files not in any group: {missing}",
              file=sys.stderr)
        return 2

    t_all = time.monotonic()
    results = []
    failed = False
    for name, files in GROUPS:
        paths = [os.path.join("tests", f) for f in files]
        t0 = time.monotonic()
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", *paths],
            cwd=REPO, capture_output=True, text=True)
        dt = time.monotonic() - t0
        tail = r.stdout.strip().splitlines()
        tally = tail[-1] if tail else "(no output)"
        ok = r.returncode == 0
        failed |= not ok
        results.append((name, ok, dt, tally))
        print(f"[{name:<9}] {'ok' if ok else 'FAIL':<4} {dt:7.1f}s  {tally}",
              flush=True)
        if not ok:
            print(r.stdout[-3000:], file=sys.stderr)
            print(r.stderr[-2000:], file=sys.stderr)

    total = time.monotonic() - t_all
    p = f = s = 0
    for _, _, _, tally in results:
        m = _TALLY.search(tally)
        if m:
            p += int(m.group(1) or 0)
            f += int(m.group(2) or 0)
            s += int(m.group(3) or 0)
    print(f"TOTAL {total:.1f}s — {p} passed, {f} failed, {s} skipped "
          f"({len(GROUPS)} process groups)")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
