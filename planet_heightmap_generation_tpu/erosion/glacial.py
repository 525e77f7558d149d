"""Glacial erosion — latitude/elevation glaciation, ice flow, U-valley
carving, moraines, fjords.

Re-design of the glacial block of erodeComposite
(js/terrain-post.js:404-557, 689-706): the sequential descending-order ice
flow becomes the same pointer-doubling accumulation used for water; valley
widening and moraine deposition are reformulated as gathers from the
carving/terminating neighbor's perspective.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

G_FLOW_THRESHOLD = 0.1
G_FJORD_THRESHOLD = 0.5


def _smoothstep(x, e0, e1):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3 - 2 * t)


@jax.jit
def glaciation_index(pos, elev, is_ocean, valid, strength):
    """Latitude/elevation glaciation index (js/terrain-post.js:416-427).
    NOTE the reference reads r_xyz[3r+1] (its y axis) as the pole axis."""
    y = pos[:, 1]
    polar = jnp.abs(jnp.arcsin(jnp.clip(y, -1.0, 1.0)))
    threshold_lat = jnp.pi / 2 - strength * jnp.pi / 4.5
    lat_factor = _smoothstep(polar, threshold_lat, jnp.pi / 2)
    elev_factor = _smoothstep(elev, 0.5, 0.9)
    lat_scale = _smoothstep(polar, jnp.pi / 8, jnp.pi / 3)
    g = jnp.maximum(lat_factor, elev_factor * 0.3 * (0.3 + 0.7 * lat_scale))
    return jnp.where((~is_ocean) & valid, g * strength, 0.0).astype(jnp.float32)


@jax.jit
def glacial_step(elev, is_ocean, nbr_idx, nbr_mask, nbr_dist, valid,
                 glac_idx, strength, g_scale):
    """One glacial iteration. ``g_scale`` = 1/gIters."""
    land = (~is_ocean) & valid
    n = elev.shape[0]

    # ice drainage: steepest strict descent among all neighbors (glaciated
    # cells only)
    drop = jnp.where(nbr_mask, elev[:, None] - elev[nbr_idx], -jnp.inf)
    best = jnp.argmax(drop, axis=1)
    best_drop = jnp.take_along_axis(drop, best[:, None], 1)[:, 0]
    ice_target = jnp.take_along_axis(nbr_idx, best[:, None], 1)[:, 0]
    has_target = land & (glac_idx > 0) & (best_drop > 0)
    ice_target = jnp.where(has_target, ice_target, -1).astype(jnp.int32)

    # ice flow: pointer-doubled accumulation seeded with glac_idx
    sink = n
    p = jnp.where(has_target, jnp.clip(ice_target, 0, n - 1), sink)

    def step(carry, _):
        s, p = carry
        added = jnp.zeros(n + 1, s.dtype).at[p].add(s)
        s2 = s + added[:n]
        p2 = jnp.concatenate([p, jnp.array([sink], p.dtype)])[p]
        return (s2, p2), None

    (ice_flow, _), _ = jax.lax.scan(
        step, (glac_idx.astype(jnp.float32), p.astype(jnp.int32)), None,
        length=22)

    # upstream tributary count: neighbors whose ice_target == me
    points_at_me = (ice_target[nbr_idx] == jnp.arange(n)[:, None]) & nbr_mask
    num_upstream = jnp.sum(points_at_me, axis=1)

    carving = land & (ice_flow > G_FLOW_THRESHOLD)
    deepening = jnp.where(
        carving, 0.02 * g_scale * jnp.power(ice_flow, 0.6) * strength, 0.0)

    delta = -deepening

    # valley widening (gather form): I receive widening from each carving
    # neighbor nb: -deepening(nb)*0.4*max(0, 1-slope(nb,me))
    d = jnp.maximum(nbr_dist, 1e-6)
    slope = jnp.abs(elev[:, None] - elev[nbr_idx]) / d
    widen = jnp.where(
        nbr_mask & carving[nbr_idx] & land[:, None] & land[nbr_idx],
        deepening[nbr_idx] * 0.4 * jnp.maximum(0.0, 1 - slope), 0.0)
    # reference lowers the NEIGHBOR of the carving cell when the neighbor is
    # land; receiving side: me (land), sender carving
    delta = delta - jnp.sum(widen, axis=1)

    # over-deepening at convergence zones
    delta = delta - jnp.where(
        carving & (num_upstream >= 2),
        0.01 * g_scale * jnp.power(ice_flow, 0.4), 0.0)

    # moraine deposition at termini: I receive deposit from each neighbor nb
    # whose ice_target is me, nb carries flow, I'm land, and my glaciation is
    # < 0.3 * nb's
    dep_ok = (points_at_me & nbr_mask & land[:, None]
              & (ice_flow[nbr_idx] > G_FLOW_THRESHOLD)
              & (glac_idx[:, None] < glac_idx[nbr_idx] * 0.3))
    deposit = jnp.sum(jnp.where(
        dep_ok, 0.005 * g_scale * jnp.power(ice_flow[nbr_idx], 0.3), 0.0), axis=1)
    delta = delta + deposit

    new = elev + jnp.where(land, delta, 0.0)

    # fjord carve on glaciated coastal cells
    coastal = jnp.any(is_ocean[nbr_idx] & nbr_mask, axis=1)
    fjord = land & coastal & (glac_idx > 0.2) & (ice_flow > G_FJORD_THRESHOLD)
    new = jnp.where(
        fjord,
        jnp.maximum(0.0, new - 0.015 * g_scale * jnp.power(ice_flow, 0.5)),
        new)

    # clamp: land stays land
    new = jnp.where(land, jnp.maximum(new, 0.0), new)
    return new.astype(jnp.float32)


@jax.jit
def glacial_post_smooth(elev, is_ocean, nbr_idx, nbr_mask, valid, glac_idx):
    """Post-loop Laplacian blend on glaciated land (js/terrain-post.js:689-706)."""
    land = (~is_ocean) & valid
    ok = nbr_mask & land[nbr_idx]
    s = jnp.sum(jnp.where(ok, elev[nbr_idx], 0.0), axis=1)
    c = jnp.sum(ok, axis=1)
    avg = s / jnp.maximum(c, 1)
    blended = elev + (avg - elev) * 0.3
    return jnp.where(land & (glac_idx > 0) & (c > 0), blended, elev).astype(jnp.float32)
