from .sharding import (make_planet_mesh, shard_cells, replicate,
                       batched_terrain_step, terrain_step)

__all__ = ["make_planet_mesh", "shard_cells", "replicate",
           "batched_terrain_step", "terrain_step"]
