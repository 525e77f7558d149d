"""Terrain domain warp — tangent-frame FBM displacement with a device-side
greedy mesh walk.

Re-design of reference warpTerrain (js/terrain-post.js:233-309). The
reference walks the mesh greedily per cell (sequential, unbounded); here the
walk runs for ALL cells simultaneously as a bounded ``fori_loop`` of masked
argmax steps — the displacement is ≤ 0.12 rad so the walk length is bounded
by displacement / cell spacing (+ slack), and greedy walks on a Delaunay
sphere mesh are monotone, so the bound is exact, not approximate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.noise import Tables, fbm


@partial(jax.jit, static_argnames=("max_steps",))
def warp_terrain(elev, pos, nbr_idx, nbr_mask, valid, noise_t: Tables,
                 strength, hotspot, max_steps: int):
    """Returns warped elevation. ``hotspot`` is the hotspot debug layer used
    to damp the warp near volcano shapes (js/terrain-post.js:294-307)."""
    n = pos.shape[0]
    x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    freq, octaves = 4.0, 5
    max_amp = 0.12 * strength

    # tangent frame (east/north), poles fall back to x (js/terrain-post.js:249-258)
    ex, ez = -z, x
    elen = jnp.sqrt(ex * ex + ez * ez)
    ok = elen > 1e-10
    ex = jnp.where(ok, ex / jnp.maximum(elen, 1e-20), 1.0)
    ez = jnp.where(ok, ez / jnp.maximum(elen, 1e-20), 0.0)
    nx = y * ez
    ny = z * ex - x * ez
    nz = -y * ex
    nlen = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    nlen = jnp.where(nlen == 0, 1.0, nlen)
    nx, ny, nz = nx / nlen, ny / nlen, nz / nlen

    d1 = fbm(noise_t, x * freq, y * freq, z * freq, octaves) * max_amp
    d2 = fbm(noise_t, x * freq + 31.7, y * freq + 47.3, z * freq + 19.1,
             octaves) * max_amp

    wx = x + ex * d1 + nx * d2
    wy = y * 1.0 + ny * d2        # ey = 0
    wz = z + ez * d1 + nz * d2
    wl = jnp.sqrt(wx * wx + wy * wy + wz * wz)
    wl = jnp.where(wl == 0, 1.0, wl)
    wx, wy, wz = wx / wl, wy / wl, wz / wl

    # greedy walk, all cells at once
    def step(_, cur):
        cand = nbr_idx[cur]                       # [N, K]
        cp = pos[cand]
        dots = cp[..., 0] * wx[:, None] + cp[..., 1] * wy[:, None] + cp[..., 2] * wz[:, None]
        dots = jnp.where(nbr_mask[cur], dots, -2.0)
        best = jnp.argmax(dots, axis=1)
        best_dot = jnp.take_along_axis(dots, best[:, None], 1)[:, 0]
        cur_pos = pos[cur]
        cur_dot = cur_pos[:, 0] * wx + cur_pos[:, 1] * wy + cur_pos[:, 2] * wz
        nxt = jnp.take_along_axis(cand, best[:, None], 1)[:, 0]
        return jnp.where(best_dot > cur_dot, nxt, cur)

    cur = jax.lax.fori_loop(0, max_steps, step,
                            jnp.arange(n, dtype=jnp.int32))
    warped = elev[cur]

    # weighted-max merge, damped near hotspots (js/terrain-post.js:291-308)
    warp_bias = 0.25 + 0.5 * strength
    hot_frac = jnp.minimum(
        1.0, jnp.abs(hotspot) / jnp.maximum(jnp.abs(elev), 1e-20))
    bias = warp_bias * (1.0 - 0.8 * hot_frac)
    merged = jnp.where(
        warped > elev,
        elev + (warped - elev) * bias,
        warped + (elev - warped) * (1.0 - bias),
    )
    return jnp.where(valid, merged, elev).astype(jnp.float32)
