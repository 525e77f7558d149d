"""Bilateral smoothing, ridge sharpening, soil creep — [N,K] gather kernels.

Re-designs of reference smoothElevation (js/terrain-post.js:317-354),
sharpenRidges (:713-751) and applySoilCreep (:758-794). Iteration counts are
static so the loops unroll under jit and XLA fuses consecutive passes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("iterations",))
def smooth_elevation(elev, is_ocean, nbr_idx, nbr_mask, valid,
                     iterations: int, strength):
    """Bilateral-weighted Laplacian: weight 1/(1+8|Δh|) preserves ridges;
    coastline cells (land with an ocean neighbor) are locked."""
    land = (~is_ocean) & valid
    locked = land & jnp.any(is_ocean[nbr_idx] & nbr_mask, axis=1)
    movable = valid & (~locked)

    for _ in range(iterations):
        nh = elev[nbr_idx]
        w = jnp.where(nbr_mask, 1.0 / (1.0 + jnp.abs(nh - elev[:, None]) * 8.0), 0.0)
        w_sum = jnp.sum(w, axis=1)
        h_avg = jnp.sum(nh * w, axis=1) / jnp.maximum(w_sum, 1e-20)
        new = elev + (h_avg - elev) * strength
        elev = jnp.where(movable & (w_sum > 0), new, elev)
    return elev.astype(jnp.float32)


@partial(jax.jit, static_argnames=("iterations",))
def sharpen_ridges(elev, is_ocean, nbr_idx, nbr_mask, valid,
                   iterations: int, strength):
    """h += (h - avgNbr)·strength when above the neighborhood mean,
    capped at 1.5× the pre-sharpening elevation."""
    land = (~is_ocean) & valid
    original = elev
    for _ in range(iterations):
        s = jnp.sum(jnp.where(nbr_mask, elev[nbr_idx], 0.0), axis=1)
        c = jnp.sum(nbr_mask, axis=1)
        avg = s / jnp.maximum(c, 1)
        new = elev + (elev - avg) * strength
        new = jnp.minimum(new, original * 1.5)
        elev = jnp.where(land & (elev > avg) & (c > 0), new, elev)
    return elev.astype(jnp.float32)


@partial(jax.jit, static_argnames=("iterations",))
def apply_soil_creep(elev, is_ocean, nbr_idx, nbr_mask, valid,
                     iterations: int, strength):
    """Plain Laplacian diffusion on interior land (coastline locked)."""
    land = (~is_ocean) & valid
    coastal = jnp.any(is_ocean[nbr_idx] & nbr_mask, axis=1)
    interior = land & (~coastal)
    for _ in range(iterations):
        ok = nbr_mask & land[nbr_idx]
        s = jnp.sum(jnp.where(ok, elev[nbr_idx], 0.0), axis=1)
        c = jnp.sum(ok, axis=1)
        avg = s / jnp.maximum(c, 1)
        new = elev + (avg - elev) * strength
        elev = jnp.where(interior & (c > 0), new, elev)
    return elev.astype(jnp.float32)
