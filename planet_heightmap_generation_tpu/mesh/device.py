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
    through jit without re-tracing; ``n_cells`` and the band offsets are
    static metadata.

    Two views of the same adjacency coexist:

    - ``nbr_idx/nbr_mask/nbr_dist [NP,K]``: the padded gather form, used by
      kernels that need per-slot neighbor selection (argmin-carry BFS,
      receivers) or circulation order.
    - ``band_off/band_mask/rem_src/rem_dst``: the banded roll form
      (mesh/build.py:build_banded) — neighbor sweeps as masked jnp.roll
      shifts over the Fibonacci spiral ordering plus a small remainder edge
      list. 10-30x cheaper per sweep on TPU than the index-bound gather.
    """

    pos: jax.Array        # [NP, 3] f32
    nbr_idx: jax.Array    # [NP, K] i32
    nbr_mask: jax.Array   # [NP, K] bool
    nbr_dist: jax.Array   # [NP, K] f32
    valid: jax.Array      # [NP] bool
    band_mask: jax.Array  # [NP, D] bool
    rem_src: jax.Array    # [M] i32 (padded rows = NP, dropped by scatters)
    rem_dst: jax.Array    # [M] i32
    n_cells: int = dataclasses.field(metadata=dict(static=True))
    band_off: tuple = dataclasses.field(metadata=dict(static=True))

    @property
    def n_padded(self) -> int:
        return self.pos.shape[0]

    @property
    def k_max(self) -> int:
        return self.nbr_idx.shape[1]

    @property
    def n_bands(self) -> int:
        return self.band_mask.shape[1]

    @property
    def bands(self) -> tuple:
        """(band_off, band_mask, rem_src, rem_dst) — splat into the
        ops.banded kernels: ``banded_min(field, *g.bands)``."""
        return (self.band_off, self.band_mask, self.rem_src, self.rem_dst)


def to_device(graph: SphereGraph) -> DeviceGraph:
    band_off, band_mask, rem_src, rem_dst = graph.banded
    return DeviceGraph(
        pos=jnp.asarray(graph.pos),
        nbr_idx=jnp.asarray(graph.nbr_idx),
        nbr_mask=jnp.asarray(graph.nbr_mask),
        nbr_dist=jnp.asarray(graph.nbr_dist),
        valid=jnp.asarray(graph.valid),
        band_mask=jnp.asarray(band_mask),
        rem_src=jnp.asarray(rem_src),
        rem_dst=jnp.asarray(rem_dst),
        n_cells=graph.n_cells,
        band_off=band_off,
    )
