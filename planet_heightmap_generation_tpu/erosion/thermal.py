"""Thermal (talus-angle) erosion — gather-only re-design.

The reference (js/terrain-post.js:644-686) scatters slope-excess material
from each cell to its lower neighbors through a delta buffer. Scatters are
expensive on TPU, so the kernel is reformulated as two gather passes over
the symmetric edge relation: every cell computes (a) how much it sheds
(sum of per-edge excess above the talus slope, × kThermal·0.5) and (b) how
much it receives from each higher neighbor — the neighbor's transfer times
that edge's share of the neighbor's total excess. Identical arithmetic,
no scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def thermal_step(elev, is_ocean, nbr_idx, nbr_mask, nbr_dist, valid,
                 talus_slope, k_thermal):
    land = (~is_ocean) & valid
    h_nb = elev[nbr_idx]
    d = jnp.maximum(nbr_dist, 1e-6)

    # edge excess as seen from the HIGHER endpoint (land→land only)
    edge_ok = nbr_mask & land[:, None] & land[nbr_idx]
    drop = elev[:, None] - h_nb                       # >0 when we are higher
    slope = drop / d
    excess_out = jnp.where(edge_ok & (slope > talus_slope),
                           (slope - talus_slope) * d, 0.0)   # [N, K]

    total_excess = jnp.sum(excess_out, axis=1)               # [N]
    transfer = k_thermal * total_excess * 0.5
    shed = jnp.where(total_excess > 0, transfer, 0.0)

    # received: for each edge where the NEIGHBOR is higher, the neighbor's
    # transfer share across this edge. By symmetry the neighbor's excess on
    # this edge equals (slope_nb→me - talus)*d computed from our side with
    # the sign flipped.
    excess_in = jnp.where(edge_ok & (-slope > talus_slope),
                          (-slope - talus_slope) * d, 0.0)
    nb_total = total_excess[nbr_idx]
    nb_transfer = transfer[nbr_idx]
    recv = jnp.sum(
        jnp.where(nb_total > 0, excess_in / jnp.maximum(nb_total, 1e-20)
                  * nb_transfer, 0.0), axis=1)

    out = elev + jnp.where(land, recv - shed, 0.0)
    return out.astype(jnp.float32)
