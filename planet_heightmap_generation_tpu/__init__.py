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

from .config import GenerationParams, detail_from_slider, slider_from_detail

__all__ = [
    "GenerationParams",
    "detail_from_slider",
    "slider_from_detail",
]
