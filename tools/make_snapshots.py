"""Regenerate the self-snapshot values in tests/test_reference_parity.py.

Run on the CPU backend (deterministic across hosts):

    JAX_PLATFORMS=cpu python tools/make_snapshots.py [config ...]

Prints a SNAPSHOTS entry per config; paste into the test file in the same
commit that intentionally changes distributional behavior. Defaults to all
configs in tests/test_reference_parity.py CONFIGS.
"""

import os
import sys

# Force a TRUE CPU run matching tests/conftest.py: the axon sitecustomize
# registers the tunneled TPU plugin whenever PALLAS_AXON_POOL_IPS is set and
# that registration wins over JAX_PLATFORMS — snapshot values produced on
# the TPU differ from the CPU values the test tier compares against.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("PLANET_JAX_CACHE", "0")
_flags = os.environ.get("XLA_FLAGS", "")
for _f in ("--xla_force_host_platform_device_count=8",
           "--xla_cpu_parallel_codegen_split_count=1"):
    if _f.split("=")[0] not in _flags:
        _flags = (_flags + " " + _f).strip()
os.environ["XLA_FLAGS"] = _flags
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np  # noqa: E402

# Reproduce the EXACT pytest jax context before any backend use: conftest
# calls jax.config.update("jax_platforms", ...), which re-initializes the
# XLA:CPU backend and shifts device float results by ~1 ULP relative to an
# env-var-only setup (measured r5: the jitted _expand_graph's nbr_dist
# differs in the last bit). The erosion cascade amplifies mesh-edge-length
# ULPs into macroscopically different planets (L1≈0.19 on the elevation
# histogram), so snapshot values generated OUTSIDE the pytest context fail
# the snapshot tests. One import makes the contexts identical.
import conftest  # noqa: E402, F401


def main():
    from planet_heightmap_generation_tpu.config import GenerationParams
    from planet_heightmap_generation_tpu.pipeline import PlanetEngine
    from test_reference_parity import CONFIGS, _metrics

    names = sys.argv[1:] or list(CONFIGS)
    for name in names:
        params = GenerationParams(skip_climate=False, **CONFIGS[name])
        m = _metrics(PlanetEngine(timing=False).generate(params))
        top = dict(sorted(m["koppen_dist"].items(), key=lambda kv: -kv[1])[:8])
        print(f"    {name}=dict(")
        print(f"        land_fraction={round(m['land_fraction'], 5)},")
        hist = [round(v, 5) for v in m["elevation_hist"]]
        print(f"        elevation_hist={hist},")
        kt = {k: round(v, 4) for k, v in top.items()}
        print(f"        koppen_top={kt},")
        print(f"        plate_count={m['plate_count']},")
        print("    ),", flush=True)


if __name__ == "__main__":
    main()
