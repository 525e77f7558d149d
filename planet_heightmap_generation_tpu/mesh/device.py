"""Device-resident mesh bundle — the static arrays every kernel consumes."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .build import SphereGraph


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceGraph:
    """Padded mesh arrays on device. Registered as a pytree so it threads
    through jit without re-tracing; ``n_cells`` is static metadata."""

    pos: jax.Array        # [NP, 3] f32
    nbr_idx: jax.Array    # [NP, K] i32
    nbr_mask: jax.Array   # [NP, K] bool
    nbr_dist: jax.Array   # [NP, K] f32
    valid: jax.Array      # [NP] bool
    n_cells: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_padded(self) -> int:
        return self.pos.shape[0]

    @property
    def k_max(self) -> int:
        return self.nbr_idx.shape[1]


def to_device(graph: SphereGraph) -> DeviceGraph:
    return DeviceGraph(
        pos=jnp.asarray(graph.pos),
        nbr_idx=jnp.asarray(graph.nbr_idx),
        nbr_mask=jnp.asarray(graph.nbr_mask),
        nbr_dist=jnp.asarray(graph.nbr_dist),
        valid=jnp.asarray(graph.valid),
        n_cells=graph.n_cells,
    )
