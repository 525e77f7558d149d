"""Priority-flood pit resolution with canyon carving — parallel re-design.

The reference (js/terrain-post.js:59-215) uses a sequential min-heap flood
(Barnes et al.) with noise-perturbed keys, then per-cell drain-path tracing
to redistribute fill deficit as carving, then a monotonic-drainage sweep in
ascending surface order. None of that maps to a TPU, so each pass becomes an
established parallel equivalent:

- Pass 1 (fill): the parallel epsilon-fill iteration
  ``surface ← max(elev, min_nbr(surface) + ε)`` run to fixed point, seeded
  from land adjacent to the largest (open) ocean component; inland seas are
  opaque to the flood exactly as in the reference (their cells are marked
  visited upfront, js/terrain-post.js:119). Converges to the same surface as
  the heap flood; the per-cell Knuth-hash noise that meanders the reference's
  flood fronts perturbs the drain-pointer selection instead.
- Pass 2 (carve): instead of tracing every drain path, the carve share of
  each pit's deficit is ACCUMULATED DOWNSTREAM along the drain forest with
  pointer doubling (log-depth scatter-add rounds) and applied where the flux
  crosses locally prominent ground — concentrating cuts at spill barriers
  (an aesthetics-preserving approximation; the fill share is exact).
- Pass 3 (monotonic enforcement): the fixpoint of
  ``elev[r] = max(elev0[r], elev[drain[r]] + ε)`` — what the reference's
  ascending sweep computes — solved exactly in O(log depth) rounds of
  max-plus pointer doubling.

The "every land cell drains monotonically to water" invariant is preserved
exactly and is tested (SURVEY.md §7 hard part 1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.graph import connected_components, hash01
from .fluvial import _log_rounds

EPS = 1e-6  # reference uses 1e-7; promoted one decade so the increment
            # survives float32 rounding at elevations ~0.5


@jax.jit
def open_ocean_mask(is_ocean, nbr_idx, nbr_mask, valid):
    """Largest connected ocean component (js/terrain-post.js:64-94)."""
    same = is_ocean[nbr_idx] & is_ocean[:, None]
    labels = connected_components(nbr_idx, nbr_mask, same)
    n = nbr_idx.shape[0]
    labels = jnp.where(is_ocean & valid, labels, n)
    sizes = jax.ops.segment_sum(
        (is_ocean & valid).astype(jnp.int32), labels, num_segments=n + 1)
    sizes = sizes.at[n].set(0)
    main = jnp.argmax(sizes)
    return is_ocean & valid & (labels == main)


@jax.jit
def _epsilon_fill(elev, is_ocean, open_ocean, nbr_idx, nbr_mask, valid):
    """Parallel priority-flood fill → (surface, drain_to).

    Inland seas (ocean cells outside the main component) are barriers: the
    flood neither relaxes through them nor drains into them."""
    n = nbr_idx.shape[0]
    big = jnp.float32(1e9)
    inland = is_ocean & (~open_ocean)

    passable = nbr_mask & (~inland[nbr_idx])
    nbr_open = open_ocean[nbr_idx] & nbr_mask
    seed = (~is_ocean) & valid & jnp.any(nbr_open, axis=1)

    surface0 = jnp.where(
        is_ocean | seed, elev, jnp.where(valid, big, elev)).astype(jnp.float32)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        surf, _ = state
        ns = jnp.where(passable, surf[nbr_idx], big)
        min_nbr = jnp.min(ns, axis=1)
        cand = jnp.maximum(elev, min_nbr + EPS)
        new = jnp.minimum(surf, cand)
        new = jnp.where(is_ocean | seed | (~valid), surf, new)
        return new, jnp.any(new != surf)

    surface, _ = jax.lax.while_loop(cond, body, (surface0, jnp.bool_(True)))

    # cells the flood never reached (land enclosed by inland seas — e.g. an
    # island inside a landlocked basin) keep their ELEVATION, exactly like
    # the reference's surface = copy(r_elevation) init (js/terrain-post.js:
    # 106): no fill, no deficit. Leaving `big` here poisoned the elevation
    # with +5e8 at cell counts where such islands occur (>=160K).
    surface = jnp.where(surface >= big * 0.5, elev, surface)

    # drain pointers. The reference meanders flood fronts with hash noise on
    # the heap keys (js/terrain-post.js:96-113); its pop order still yields
    # acyclic drainTo. Here cycles must be impossible by construction (the
    # pointer forest feeds log-depth doubling solvers), so the noise selects
    # WHICH strictly-lower-surface neighbor to drain to, never a higher one:
    # every pointer strictly decreases surface → forest, guaranteed.
    noise = hash01(jnp.arange(n, dtype=jnp.int32), 7919) * 0.01
    ns_strict = jnp.where(passable, surface[nbr_idx], jnp.inf)
    lower = passable & (ns_strict < surface[:, None] - EPS * 0.5)
    key = jnp.where(lower, ns_strict + noise[nbr_idx], jnp.inf)
    # fallback: plain min-surface neighbor if no strictly-lower one exists
    fallback = jnp.where(passable, ns_strict, jnp.inf)
    has_lower = lower.any(axis=1)
    nk = jnp.where(has_lower[:, None], key, fallback)
    nk_seed = jnp.where(nbr_open, nk, jnp.inf)
    nk_eff = jnp.where(seed[:, None], nk_seed, nk)
    best = jnp.argmin(nk_eff, axis=1)
    drain = jnp.take_along_axis(nbr_idx, best[:, None], 1)[:, 0]
    drain = jnp.where(is_ocean | (~valid), -1, drain)
    return surface, drain.astype(jnp.int32)


@partial(jax.jit, static_argnames=("rounds",))
def downstream_accumulate(values, pointers, sink_mask, rounds: int = 0):
    """For each cell, the sum of ``values`` over all upstream cells whose
    drain path passes through it (inclusive), via pointer doubling:
    S ← S + scatter_add(S along P), P ← P[P]. Cells where ``sink_mask``
    holds (and negative pointers) route to a virtual sink."""
    n = values.shape[0]
    if rounds <= 0:
        rounds = _log_rounds(n)
    sink = n
    p = jnp.where(sink_mask | (pointers < 0), sink, pointers)

    def cond(state):
        i, _, p = state
        return (i < rounds) & jnp.any(p != sink)

    def body(state):
        i, s, p = state
        added = jnp.zeros(n + 1, s.dtype).at[p].add(s)
        s2 = s + added[:n]
        p2 = jnp.concatenate([p, jnp.array([sink], p.dtype)])[p]
        return i + 1, s2, p2

    _, s, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), values, p))
    return s


@partial(jax.jit, static_argnames=("rounds",))
def monotonic_enforce(elev, drain, is_ocean, valid, rounds: int = 0):
    """Exact fixpoint of elev'[r] = max(elev[r], elev'[drain[r]] + ε), with
    ocean target elevation treated as 0 (js/terrain-post.js:198-214).

    Unrolled: elev'[r] = max_k ( g[d^k(r)] + k·ε ), g = elev on land, 0 on
    water. Solved by max-plus pointer doubling over (M, L, P): M covers the
    path prefix of length L ending at P.
    """
    n = elev.shape[0]
    if rounds <= 0:
        rounds = _log_rounds(n)
    land = (~is_ocean) & valid & (drain >= 0)
    g = jnp.where(is_ocean, 0.0, elev).astype(jnp.float32)

    m = g
    l = jnp.ones(n, jnp.float32)
    p = jnp.where(land, drain, n).astype(jnp.int32)

    def cond(state):
        i, _, _, p = state
        return (i < rounds) & jnp.any(p != n)

    def body(state):
        # one packed [N+1,3] gather per round (index-bound on TPU)
        i, m, l, p = state
        packed = jnp.stack([
            jnp.concatenate([m, jnp.array([-jnp.inf], m.dtype)]),
            jnp.concatenate([l, jnp.array([0.0], l.dtype)]),
            jnp.concatenate([p, jnp.array([n], p.dtype)]).view(jnp.float32),
        ], axis=1)
        gp = packed[p]
        m2 = jnp.maximum(m, gp[:, 0] + l * EPS)
        l2 = l + gp[:, 1]
        pp = gp[:, 2].view(jnp.int32)
        return i + 1, m2, l2, pp

    _, m, _, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), m, l, p))
    out = jnp.where(land, jnp.maximum(elev, m), elev)
    return out.astype(jnp.float32)


@jax.jit
def priority_flood_carve(elev, is_ocean, nbr_idx, nbr_mask, valid,
                         carve_strength):
    """Full pit resolution: fill + carve + monotonic drainage.
    Returns (elevation, drain_to, surface)."""
    open_ocean = open_ocean_mask(is_ocean, nbr_idx, nbr_mask, valid)
    surface, drain = _epsilon_fill(elev, is_ocean, open_ocean,
                                   nbr_idx, nbr_mask, valid)
    deficit = jnp.where((~is_ocean) & valid,
                        jnp.maximum(0.0, surface - elev), 0.0)

    # fill share (exact): raise pit floors by (1 - carve) of the deficit
    elev2 = elev + deficit * (1.0 - carve_strength)

    # carve share (approximation): route carve flux downstream and cut where
    # it crosses locally prominent ground (spill barriers)
    flux = downstream_accumulate(deficit * carve_strength, drain,
                                 is_ocean | (~valid))
    nbr_sum = jnp.sum(jnp.where(nbr_mask, elev2[nbr_idx], 0.0), axis=1)
    nbr_cnt = jnp.maximum(1, jnp.sum(nbr_mask, axis=1))
    prominence = jnp.maximum(0.0, elev2 - nbr_sum / nbr_cnt)
    carve = jnp.minimum(flux, prominence * 2.0 + flux * 0.25)
    carve = jnp.where((~is_ocean) & valid & (deficit <= EPS), carve, 0.0)
    elev3 = jnp.maximum(0.0, elev2 - carve)
    elev3 = jnp.where((~is_ocean) & valid, elev3, elev2)

    # monotonic drainage enforcement (exact)
    out = monotonic_enforce(elev3, drain, is_ocean, valid)
    return jnp.where(valid, out, elev).astype(jnp.float32), drain, surface
