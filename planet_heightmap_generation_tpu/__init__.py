"""TPU-native planet generation engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of World Orogen
(raguilar011095/planet_heightmap_generation): deterministic seeded generation of
terrestrial planets on a Fibonacci-sphere Voronoi mesh — tectonics, elevation
synthesis, erosion, two-season climate, Köppen classification, planet codes,
heightmap import and equirectangular export — re-designed TPU-first.

The mesh is a fixed-degree padded neighbor-index array; every field is an [N]
device array; every reference algorithm is one of four kernel families:
per-cell map, neighbor gather-reduce, iterated propagation (lax.while_loop
min-plus / label propagation), or pointer-doubling solvers for the sequential
erosion recurrences.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache. The pipeline is ~40 distinct jitted
    kernels and TPU compiles run 10-60 s each; caching them on disk makes
    every process after the first start hot (the reference's analog is the
    browser's shader/code cache). Opt out with PLANET_JAX_CACHE=0."""
    cache = _os.environ.get("PLANET_JAX_CACHE", "")
    if cache == "0":
        return
    # CPU-only processes (tests, the multichip dryrun) must NOT use the
    # persistent cache: this jaxlib's XLA:CPU AOT deserialization is
    # machine-feature sensitive and intermittently SEGFAULTS reloading
    # entries ("prefer-no-scatter ... could lead to execution errors").
    # The cache's value is the slow remote TPU compiles anyway.
    if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return
    if not cache:
        # repo-local only when running from a source checkout; an installed
        # copy (site-packages) caches under the user cache dir instead of
        # writing into the install tree
        parent = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        if _os.path.isdir(_os.path.join(parent, ".git")):
            cache = _os.path.join(parent, ".jax_cache")
        else:
            cache = _os.path.join(
                _os.environ.get("XDG_CACHE_HOME",
                                _os.path.expanduser("~/.cache")),
                "planet_tpu", "jax")
    try:
        _os.makedirs(cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is an optimization, never a hard dependency
        pass


_enable_compilation_cache()

from .config import GenerationParams, detail_from_slider, slider_from_detail

__all__ = [
    "GenerationParams",
    "detail_from_slider",
    "slider_from_detail",
]
