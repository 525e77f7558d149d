"""Banded neighbor sweeps — masked jnp.roll shifts over the Fibonacci
spiral ordering.

The spiral mesh ordering makes neighbor index offsets (j - i) concentrate
onto ~32 signed Fibonacci numbers (mesh/build.py:build_banded). A neighbor
reduction then becomes D rolls of the field with per-band masks plus a
small remainder-edge scatter — contiguous vector reads instead of the
index-bound [N,K] gather. Measured on TPU v5e (min-sweep, 50 iterations):

    N=1M  F=1:  gather 62 ms/sweep → banded 2.3 ms  (27x)
    N=1M  F=5:  gather 54 ms/sweep → banded 7.3 ms  (7x)
    N=204K F=5: gather 6.0 ms/sweep → banded 2.1 ms (3x)

Results are bit-identical to the gather form for order-independent
reductions (min/max); float sums differ only in accumulation order.

Neighbor-side cell gates (e.g. "only relax through non-barrier cells")
are expressed by pre-masking the FIELD with the fill value — no per-edge
gate arrays needed. True per-edge gates precompute a [N,D] band gate with
:func:`band_gate` (one-off rolls of the cell property, hoisted out of
sweep loops).

Every kernel here takes the graph's ``band_off`` (static tuple),
``band_mask [NP,D]``, ``rem_src/rem_dst [M]`` — normally via a
:class:`..mesh.device.DeviceGraph`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _expand(mask, field):
    """Broadcast a [N] or [N,D] mask against field rank ([N] or [N,F])."""
    return mask[:, None] if field.ndim == 2 and mask.ndim == 1 else mask


def band_shift(field, off):
    """field[i + off] along the cell axis (wrap killed by band masks)."""
    return jnp.roll(field, -off, axis=0)


def band_gate(cell_value, band_off, band_mask):
    """[N,D] per-edge gate from a per-cell value: gate[i,d] =
    band_mask[i,d] & (cell_value[i + off_d] == cell_value[i]).
    Loop-invariant — compute once, reuse across sweeps."""
    cols = [band_mask[:, d] & (band_shift(cell_value, off) == cell_value)
            for d, off in enumerate(band_off)]
    return jnp.stack(cols, axis=1)


def band_nbr_dist(pos, band_off, band_mask):
    """[N,D] chord distance to each band neighbor, 0 where absent —
    the banded analog of nbr_dist, computed from positions on device."""
    cols = []
    for d, off in enumerate(band_off):
        delta = band_shift(pos, off) - pos
        cols.append(jnp.where(band_mask[:, d],
                              jnp.linalg.norm(delta, axis=1), 0.0))
    return jnp.stack(cols, axis=1).astype(jnp.float32)


def rem_gather(field, rem_dst):
    """Remainder-edge neighbor values, [M] or [M,F]."""
    return field[rem_dst]


def banded_min(field, band_off, band_mask, rem_src, rem_dst,
               fill=jnp.inf, gate=None):
    """Min over neighbors. ``field``: [N] or [N,F]. ``gate``: optional
    [N,D] band gate (remainder edges are NOT gated — pre-mask the field
    for neighbor-side gates, which covers remainder too)."""
    out = jnp.full_like(field, fill)
    for d, off in enumerate(band_off):
        m = band_mask[:, d] if gate is None else gate[:, d]
        out = jnp.minimum(out, jnp.where(_expand(m, field),
                                         band_shift(field, off), fill))
    out = out.at[rem_src].min(rem_gather(field, rem_dst), mode="drop")
    return out


def banded_max(field, band_off, band_mask, rem_src, rem_dst,
               fill=-jnp.inf, gate=None):
    out = jnp.full_like(field, fill)
    for d, off in enumerate(band_off):
        m = band_mask[:, d] if gate is None else gate[:, d]
        out = jnp.maximum(out, jnp.where(_expand(m, field),
                                         band_shift(field, off), fill))
    out = out.at[rem_src].max(rem_gather(field, rem_dst), mode="drop")
    return out


def banded_sum(field, band_off, band_mask, rem_src, rem_dst, gate=None):
    """Sum over neighbors ([N] or [N,F]). Accumulation order differs from
    the gather form (bands, then remainder) — equal within float tolerance."""
    out = jnp.zeros_like(field)
    for d, off in enumerate(band_off):
        m = band_mask[:, d] if gate is None else gate[:, d]
        out = out + jnp.where(_expand(m, field), band_shift(field, off), 0)
    out = out.at[rem_src].add(rem_gather(field, rem_dst), mode="drop")
    return out


def banded_count(band_mask, rem_src, gate=None, dtype=jnp.int32):
    """Neighbor degree [N] (loop-invariant; compute once per gate)."""
    m = band_mask if gate is None else gate
    out = jnp.sum(m, axis=1).astype(dtype)
    npad = band_mask.shape[0]
    ones = jnp.ones(rem_src.shape[0], dtype)
    return out.at[rem_src].add(ones, mode="drop") if rem_src.shape[0] else out


def bfs_hops_multi_banded(seeds, barrier, band_off, band_mask,
                          rem_src, rem_dst, max_hops: int = 0,
                          rand_cost=None, value_cap=None):
    """Banded drop-in for ops.graph.bfs_hops_multi — F independent
    hop-distance BFS fields relaxed together. Dispatches to the Pallas
    inner-sweep kernel on TPU (ops/sweep_pallas.py) and the flat [F*N]
    jnp min-plus loop elsewhere.

    Cap semantics: the jnp path bounds ITERATIONS at ``max_hops``
    (values beyond may be path-order overestimates, unreached = +inf);
    the pallas path bounds VALUES at ``value_cap`` (defaults to
    ``max_hops`` when costs are unit) — exact min(true_dist, cap) below
    the cap, ≥cap mapped back to +inf. Both are indistinguishable to
    consumers, which saturate strictly below the cap; the pallas form is
    strictly MORE exact in the cap's approach band (it removes the
    (0.65·cap, cap) overestimate band the round-2 advisor flagged)."""
    from .sweep_pallas import use_pallas

    if use_pallas(band_mask.shape[0]):
        if value_cap is None and max_hops > 0 and rand_cost is None:
            value_cap = float(max_hops)
        return _bfs_hops_multi_pallas(seeds, barrier, band_off, band_mask,
                                      rem_src, rem_dst,
                                      value_cap=value_cap,
                                      rand_cost=rand_cost)
    return _bfs_hops_multi_jnp(seeds, barrier, band_off, band_mask,
                               rem_src, rem_dst, max_hops, rand_cost)


@partial(jax.jit, static_argnames=("band_off", "value_cap"))
def _bfs_hops_multi_pallas(seeds, barrier, band_off, band_mask,
                           rem_src, rem_dst, value_cap=None,
                           rand_cost=None):
    """Pallas-kernel BFS loop: barrier/seed semantics BAKED into the
    inputs (cost=+inf at non-seed barriers so they never update and
    propagate only their initial +inf; dist0=0 at seeds, which no
    non-negative-cost relaxation can lower), remainder edges applied on
    [M]-sized gathers outside the kernel, ``inner`` sweeps per dispatch
    (stale-halo relaxation — same unique fixpoint). With ``value_cap``
    the fixpoint is exactly min(true_dist, cap); cells at the cap are
    mapped back to +inf (the unreached convention)."""
    from .sweep_pallas import BfsSweeper

    n, f = seeds.shape
    nf = n * f
    inf = jnp.float32(jnp.inf)
    seeds_f = _flat(seeds)
    barrier_f = _flat(barrier)
    dist0 = jnp.where(seeds_f, 0.0, inf).astype(jnp.float32)
    cost = jnp.ones((nf,), jnp.float32) if rand_cost is None \
        else _flat(rand_cost).astype(jnp.float32)
    cost = jnp.where(barrier_f & (~seeds_f), inf, cost)
    src_f, dst_f, _, _ = _flat_rem(rem_src, rem_dst, n, f)

    sw = BfsSweeper(band_off, f, n, cap=value_cap)
    dist_p, cost_p, bits = sw.prep(dist0, band_mask, cost)

    def pad_idx(i):
        # flat [F*N] index -> padded [F*NP8] index (field blocks widen)
        fblk = i // n
        return fblk * sw.np8 + (i - fblk * n)

    src_p = jnp.where(src_f < nf, pad_idx(src_f), f * sw.np8)
    srcc_p = jnp.clip(src_p, 0, f * sw.np8 - 1)
    dst_p = pad_idx(dst_f)
    capf = jnp.float32(jnp.inf if value_cap is None else value_cap)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        dist, _ = state
        new, chg = sw.sweep(dist, bits, cost_p)
        # remainder edges: dest rem_src receives neighbor rem_dst's
        # PRE-dispatch value + the dest cost (+inf at barriers blocks it)
        cand = jnp.minimum(dist[dst_p] + cost_p[srcc_p], capf)
        new2 = new.at[src_p].min(cand, mode="drop")
        changed = (jnp.max(chg) > 0) | jnp.any(new2[srcc_p] != new[srcc_p])
        return new2, changed

    dist, _ = jax.lax.while_loop(
        cond, body, (dist_p, jnp.bool_(True)))
    if value_cap is not None:
        # ≥cap → +inf: the hop-capped jnp path's "unreached" convention
        dist = jnp.where(dist >= capf, inf, dist)
    return sw.finish(dist)


@partial(jax.jit, static_argnames=("band_off", "max_hops"))
def _bfs_hops_multi_jnp(seeds, barrier, band_off, band_mask,
                        rem_src, rem_dst, max_hops: int = 0,
                        rand_cost=None):
    """The flat [F*N] jnp min-plus loop (see the flat-helper block above
    for why not [N,F]). Bit-identical to the gather form."""
    n, f = seeds.shape
    nf = n * f
    inf = jnp.float32(jnp.inf)
    dist0 = jnp.where(_flat(seeds), 0.0, inf).astype(jnp.float32)
    cost = jnp.ones((nf,), jnp.float32) if rand_cost is None \
        else _flat(rand_cost)
    barrier_f = _flat(barrier)
    seeds_f = _flat(seeds)
    fmask = _flat_masks(band_mask, band_off, f)
    src_f, dst_f, _, _ = _flat_rem(rem_src, rem_dst, n, f)

    def cond(state):
        i, _, changed = state
        if max_hops > 0:
            return changed & (i < max_hops)
        return changed

    def body(state):
        i, dist, _ = state
        dbl = jnp.concatenate([dist, dist])
        best = jnp.full((nf,), inf)
        for d, off in enumerate(band_off):
            sh = _dbl_shift(dbl, off, nf)
            best = jnp.minimum(best, jnp.where(fmask[d], sh, inf))
        best = best.at[src_f].min(dist[dst_f], mode="drop")
        new = jnp.minimum(dist, best + cost)
        new = jnp.where(barrier_f, inf, new)
        new = jnp.where(seeds_f, 0.0, new)
        return i + 1, new, jnp.any(new != dist)

    _, dist, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), dist0, jnp.bool_(True))
    )
    return _unflat(dist, n)


def smooth_field_banded(field, band_off, band_mask, rem_src, rem_dst,
                        passes: int):
    """Banded Laplacian smoothing incl. self (ops for js/climate-util.js:5-25
    parity — drop-in for climate.util.smooth_field). Dispatches to the
    Pallas sweep kernel on TPU."""
    from .sweep_pallas import use_pallas

    impl = (_smooth_field_pallas if use_pallas(field.shape[0])
            else _smooth_field_jnp)
    return impl(field, band_off, band_mask, rem_src, rem_dst, passes)


def smooth_masked_banded(field, mask, band_off, band_mask, rem_src, rem_dst,
                         passes: int):
    """Banded smoothing restricted to ``mask`` cells (drop-in for
    climate.util.smooth_masked): non-mask cells neither contribute nor
    update. Neighbor-side gate = zero the field outside the mask.
    Dispatches to the Pallas sweep kernel on TPU."""
    from .sweep_pallas import use_pallas

    impl = (_smooth_masked_pallas if use_pallas(field.shape[0])
            else _smooth_masked_jnp)
    return impl(field, mask, band_off, band_mask, rem_src, rem_dst, passes)


@partial(jax.jit, static_argnames=("band_off", "passes"))
def _smooth_field_jnp(field, band_off, band_mask, rem_src, rem_dst,
                      passes: int):
    deg = banded_count(band_mask, rem_src, dtype=jnp.float32)
    c = deg + 1
    if field.ndim == 2:
        c = c[:, None]
    field = field.astype(jnp.float32)

    # fori_loop, not a Python unroll: pass counts scale with sqrt(N) (km →
    # hops), and unrolled passes bloat the fused executable — whose BYTES
    # are the dominant cold-start cost shipped over the tunneled backend.
    def body(_, f):
        return (f + banded_sum(f, band_off, band_mask, rem_src, rem_dst)) / c

    return jax.lax.fori_loop(0, passes, body, field)


@partial(jax.jit, static_argnames=("band_off", "passes"))
def _smooth_masked_jnp(field, mask, band_off, band_mask, rem_src, rem_dst,
                       passes: int):
    maskx = _expand(mask, field)
    mf = mask.astype(jnp.float32)
    cnt = banded_sum(mf, band_off, band_mask, rem_src, rem_dst)
    c = 1 + (cnt[:, None] if field.ndim == 2 else cnt)
    field = field.astype(jnp.float32)

    def body(_, f):
        contrib = jnp.where(maskx, f, 0.0)
        s = f + banded_sum(contrib, band_off, band_mask, rem_src, rem_dst)
        return jnp.where(maskx, s / c, f)

    return jax.lax.fori_loop(0, passes, body, field)


def _smooth_rem_setup(rem_src, rem_dst, n, np8):
    """Remainder-edge indices against the NP8-padded [F, NP8] layout."""
    real = rem_src < n
    src = jnp.where(real, rem_src, np8)       # drop padded rows past NP8
    dst = jnp.clip(rem_dst, 0, n - 1)
    return real, src, dst


@partial(jax.jit, static_argnames=("band_off", "passes"))
def _smooth_field_pallas(field, band_off, band_mask, rem_src, rem_dst,
                         passes: int):
    """Pallas smoothing: band sums in the sweep kernel, remainder-edge
    neighbor sums as [M]-sized scatters per pass. Results match the jnp
    path within float addition order (band order is identical; remainder
    contributions are added after the bands in both paths)."""
    from .sweep_pallas import SmoothSweeper, pack_band_bits

    n = band_mask.shape[0]
    one_d = field.ndim == 1
    f2 = (field[None, :] if one_d else field.T).astype(jnp.float32)
    f = f2.shape[0]
    sw = SmoothSweeper(band_off, f, n, masked=False)
    deg = banded_count(band_mask, rem_src, dtype=jnp.float32)
    inv = sw.pad((1.0 / (deg + 1.0))[None, :])
    bits = sw.pad(pack_band_bits(band_mask).reshape(1, n))
    fp = sw.pad(f2)
    real, src, dst = _smooth_rem_setup(rem_src, rem_dst, n, sw.np8)

    def body(_, fp):
        rem = jnp.zeros((f, sw.np8), jnp.float32).at[:, src].add(
            jnp.where(real, fp[:, dst], 0.0), mode="drop")
        return sw.sweep(fp, None, bits, rem, inv)

    fp = jax.lax.fori_loop(0, passes, body, fp)
    out = fp[:, :n]
    return (out[0] if one_d else out.T).astype(jnp.float32)


@partial(jax.jit, static_argnames=("band_off", "passes"))
def _smooth_masked_pallas(field, mask, band_off, band_mask, rem_src,
                          rem_dst, passes: int):
    from .sweep_pallas import SmoothSweeper, pack_band_bits

    n = band_mask.shape[0]
    one_d = field.ndim == 1
    f2 = (field[None, :] if one_d else field.T).astype(jnp.float32)
    f = f2.shape[0]
    sw = SmoothSweeper(band_off, f, n, masked=True)
    mf = mask.astype(jnp.float32)
    cnt = banded_sum(mf, band_off, band_mask, rem_src, rem_dst)
    inv = sw.pad((1.0 / (1.0 + cnt))[None, :])
    mp = sw.pad(mf[None, :])
    bits = sw.pad(pack_band_bits(band_mask).reshape(1, n))
    fp = sw.pad(f2)
    real, src, dst = _smooth_rem_setup(rem_src, rem_dst, n, sw.np8)
    m_dst = jnp.where(real, mask[dst], False)

    def body(_, fp):
        rem = jnp.zeros((f, sw.np8), jnp.float32).at[:, src].add(
            jnp.where(m_dst, fp[:, dst], 0.0), mode="drop")
        return sw.sweep(fp, mp, bits, rem, inv)

    fp = jax.lax.fori_loop(0, passes, body, fp)
    out = fp[:, :n]
    return (out[0] if one_d else out.T).astype(jnp.float32)


def _rem_real(rem_src, npad):
    return rem_src < npad


# ── flat multi-field helpers ─────────────────────────────────────────
# A [N,F] (or [F,N]) loop carry lets XLA's layout assignment put the
# F≪128 axis in the lane dimension — padding it to 128 lanes and turning
# every loop-body op into a 64-128x bandwidth waste (measured: the 2-field
# stress loop at 31 ms/pass vs ~1 ms; layout {0,1} on f32[2,N] in the
# compiled while body). 1-D arrays have exactly one layout, so the
# multi-field while loops below run FLAT: fields concatenated field-major
# into [F*N], band shifts as static slices of a pre-doubled [2FN] array
# (one slice serves all fields; block-boundary crossings are exactly the
# out-of-range cells the band masks already kill), and per-(edge,field)
# masks pre-tiled to flat [FN] loop-invariants.

def _flat(x):
    """[N,F] → [F*N] field-major (block f = field f's cells)."""
    return x.T.reshape(-1)


def _unflat(xf, n):
    """[F*N] → [N,F]."""
    return xf.reshape(-1, n).T


def _dbl_shift(dbl, off, n_flat):
    """Static-slice shift: dbl = concat([x, x]); returns x[(i+off) mod FN].
    In-block cells land on their own field's data; cross-block entries are
    band-masked by construction (i+off outside [0,N))."""
    s0 = off % n_flat
    return jax.lax.slice_in_dim(dbl, s0, s0 + n_flat)


def _flat_masks(band_mask, band_off, f):
    """Tuple of D flat [F*N] band masks (loop-invariant)."""
    return tuple(jnp.concatenate([band_mask[:, d]] * f)
                 for d in range(len(band_off)))


def _flat_rem(rem_src, rem_dst, npad, f):
    """Flat remainder-edge indices [F*M]: invalid sources map to F*N
    (dropped by mode='drop'), destinations are clipped per field block."""
    real = rem_src < npad
    src_c = jnp.clip(rem_src, 0, npad - 1)
    dst_c = jnp.clip(rem_dst, 0, npad - 1)
    src_f = jnp.concatenate([jnp.where(real, rem_src + g * npad, f * npad)
                             for g in range(f)])
    dst_f = jnp.concatenate([dst_c + g * npad for g in range(f)])
    srcc_f = jnp.concatenate([src_c + g * npad for g in range(f)])
    return src_f, dst_f, srcc_f, jnp.concatenate([real] * f)


def banded_select(key_src, payloads, band_off, band_mask, rem_src, rem_dst,
                  gate=None, rem_gate=None, minimize=False,
                  edge_payloads=None, rem_edge_payloads=None,
                  fill=None, gate_mix=None, gate_stack=None):
    """Per-cell best-neighbor selection: for each cell i, find the neighbor
    j maximizing (or minimizing) ``key_src[j]`` over gated edges, and return
    that neighbor's payload values — the banded replacement for the
    argmax/argmin-carry gathers (stress propagation, carry BFS).

    - ``key_src``: [N] or [N,F] — the candidate key AT THE SOURCE cell
      (anything per-hop, like dist+1, is folded in by the caller).
    - ``payloads``: list of [N(,F)] source fields selected alongside the key.
    - ``gate``: [N,D(,F)] band gate; ``rem_gate``: [M(,F)] remainder gate.
    - ``edge_payloads``: list of [N,D(,F)] per-EDGE values (e.g. edge
      length) selected per band; ``rem_edge_payloads``: matching [M(,F)].
    - Returns (best_key, [selected payloads...], [selected edge payloads...])
      with ``fill`` (default ±inf) where no gated neighbor exists.

    Ties: bands are scanned in ascending-offset order and the FIRST best
    wins; remainder edges are merged last and win only on strict
    improvement, with equal-key remainder ties resolved toward the maximum
    payload. (The gather form resolves ties by slot order instead — results
    differ only where two candidates carry bit-equal keys.)
    """
    if fill is None:
        fill = jnp.inf if minimize else -jnp.inf
    better = (lambda a, b: a < b) if minimize else (lambda a, b: a > b)
    npad = band_mask.shape[0]
    payloads = list(payloads)
    edge_payloads = list(edge_payloads or [])

    best_key = jnp.full_like(key_src, fill)
    best_pay = [jnp.zeros_like(p) for p in payloads]
    best_epay = [jnp.zeros_like(ep[:, 0]) for ep in edge_payloads]

    for d, off in enumerate(band_off):
        # per-band gate, built lazily — a materialized [N,D,F] gate tensor
        # tile-pads badly on TPU (977MB of pred at 4M cells), so the
        # structured forms compose per band instead:
        #   gate_mix  = (eq_gate [N,D], use [F]): field f uses eq_gate
        #               where use[f], else the plain band mask
        #   gate_stack= tuple of per-field [N,D] gates
        if gate_mix is not None:
            eq, use = gate_mix
            m = jnp.where(use[None, :], eq[:, d, None],
                          band_mask[:, d, None])
        elif gate_stack is not None:
            m = jnp.stack([gf[:, d] for gf in gate_stack], axis=1)
        elif gate is None:
            m = band_mask[:, d]
        else:
            m = gate[:, d]
        k = jnp.where(_expand(m, key_src), band_shift(key_src, off), fill)
        upd = better(k, best_key)
        best_key = jnp.where(upd, k, best_key)
        best_pay = [jnp.where(_expand_u(upd, p), band_shift(p, off), bp)
                    for p, bp in zip(payloads, best_pay)]
        best_epay = [jnp.where(_expand_u(upd, ep[:, d]), ep[:, d], bep)
                     for ep, bep in zip(edge_payloads, best_epay)]

    # remainder edges: winner key per cell via scatter-extremum, payloads by
    # the two-phase trick (mask to winning edges, scatter-extremum again)
    real = _rem_real(rem_src, npad)
    rg = real if rem_gate is None else (_expand_u(real, rem_gate) & rem_gate)
    rgx = _expand(rg, key_src)                    # match key rank ([M,F])
    rk = jnp.where(rgx, key_src[rem_dst], fill)
    w = jnp.full_like(key_src, fill)
    w = w.at[rem_src].min(rk, mode="drop") if minimize else \
        w.at[rem_src].max(rk, mode="drop")
    is_win = rgx & (rk == w[jnp.clip(rem_src, 0, npad - 1)])
    upd = better(w, best_key)
    best_key = jnp.where(upd, w, best_key)

    def pick(cand):
        c = jnp.where(_expand(is_win, cand), cand, -jnp.inf)
        out = jnp.full(w.shape, -jnp.inf, cand.dtype)
        return out.at[rem_src].max(c, mode="drop")

    best_pay = [jnp.where(_expand_u(upd, p), pick(p[rem_dst]), bp)
                for p, bp in zip(payloads, best_pay)]
    best_epay = [jnp.where(_expand_u(upd, bep), pick(rep), bep)
                 for rep, bep in zip(rem_edge_payloads or [], best_epay)]
    return best_key, best_pay, best_epay


def _expand_u(mask, like):
    """Broadcast an update mask against a payload's rank."""
    if like.ndim == mask.ndim + 1:
        return mask[..., None]
    return mask


def propagate_stress_banded(stress, subduct, gate_stack, rem_gate,
                            ocean_cell, band_off, band_mask, rem_src,
                            rem_dst, decay, subduct_decay, num_passes):
    """Stress-relax dispatcher (plain Python, like _epsilon_fill: the
    pallas/jnp choice must be part of the jit identity, not an avals-keyed
    trace cache). ``decay``/``subduct_decay`` must be Python floats — the
    pallas path bakes them into the kernel."""
    from .sweep_pallas import use_pallas

    if use_pallas(stress.shape[0]):
        return _propagate_stress_pallas(
            stress, subduct, gate_stack, rem_gate, ocean_cell, band_off,
            band_mask, rem_src, rem_dst, float(decay), float(subduct_decay),
            int(num_passes))
    return _propagate_stress_jnp(
        stress, subduct, gate_stack, rem_gate, ocean_cell, band_off,
        band_mask, rem_src, rem_dst, decay, subduct_decay, num_passes)


@partial(jax.jit, static_argnames=("band_off", "num_passes", "decay",
                                   "subduct_decay"))
def _propagate_stress_pallas(stress, subduct, gate_stack, rem_gate,
                             ocean_cell, band_off, band_mask, rem_src,
                             rem_dst, decay, subduct_decay, num_passes):
    """Pallas inner-sweep stress relax (ops/sweep_pallas.StressSweeper):
    8 gated argmax sweeps per dispatch on the VMEM halo window — the
    synchronous process is the monotone fixpoint
    ``st(i) = max_s st0(s)·eff(s)^hops`` (see the kernel docstring), so
    stale-halo inner sweeps converge to the same values; remainder edges
    are applied once per DISPATCH (≤ inner hops late — their paths just
    take extra dispatches; the early exit covers them). The num_passes
    hop cap binds only at the 0.005-threshold fringe where values are
    sub-visual, and is honored within ±2·inner hops (jnp path: exact)."""
    from .sweep_pallas import StressSweeper

    G = stress.shape[1]
    npad = stress.shape[0]
    real = rem_src < npad
    src_c = jnp.clip(rem_src, 0, npad - 1)

    sts, sfs = [], []
    for g in range(G):
        st0 = stress[:, g].astype(jnp.float32)
        sf0 = subduct[:, g].astype(jnp.float32)
        act0 = st0 > 0.01
        sw = StressSweeper(band_off, npad, decay, subduct_decay)
        rounds = -(-num_passes // sw.inner) + 2
        state, bits = sw.prep(st0, sf0, act0, ocean_cell[:, g],
                              gate_stack[g] & band_mask)
        rg = rem_gate[:, g] & real
        np8 = sw.np8

        def cond(c):
            i, _, chg = c
            return chg & (i < rounds)

        def body(c):
            i, state, _ = c
            new, chg = sw.sweep(state, bits)
            s2 = new.reshape(4, np8)
            st, sf = s2[0], s2[1]
            act, oc = s2[2], s2[3]
            # remainder edges: sender side read at rem_dst, two-phase
            # scatter-argmax onto rem_src (same construction as the jnp
            # loop, applied once per dispatch)
            st_s, sf_s = st[rem_dst], sf[rem_dst]
            eff = jnp.where(sf_s > 0.5, jnp.float32(subduct_decay),
                            jnp.float32(decay))
            prop = st_s * eff
            ok = rg & (act[rem_dst] > 0) & (oc[rem_dst] <= 0)                 & (prop >= 0.005)
            key = jnp.where(ok, prop, -jnp.inf)
            w = jnp.full((np8,), -jnp.inf, jnp.float32)
            w = w.at[rem_src].max(key, mode="drop")
            is_win = ok & (key == w[src_c])
            cand = jnp.where(is_win, sf_s, -jnp.inf)
            wsf = jnp.full((np8,), -jnp.inf, jnp.float32)
            wsf = wsf.at[rem_src].max(cand, mode="drop")
            upd = w > st
            st2 = jnp.where(upd, w, st)
            sf2 = jnp.where(upd, wsf, sf)
            act2 = jnp.maximum(act, upd.astype(jnp.float32))
            new2 = jnp.stack([st2, sf2, act2, oc]).reshape(-1)
            changed = (jnp.max(chg) > 0) | jnp.any(upd)
            return i + 1, new2, changed

        _, state, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), state, jnp.bool_(True)))
        st_out, sf_out = sw.finish(state)
        sts.append(st_out)
        sfs.append(sf_out)
    return jnp.stack(sts, 1), jnp.stack(sfs, 1)


@partial(jax.jit, static_argnames=("band_off", "num_passes"))
def _propagate_stress_jnp(stress, subduct, gate_stack, rem_gate, ocean_cell,
                          band_off, band_mask, rem_src, rem_dst,
                          decay, subduct_decay, num_passes):
    """Banded drop-in for elevation.collisions.propagate_stress_multi:
    G stress layers relax together; per sweep each cell adopts the
    strongest propagated stress among gated (same-plate) neighbors, the
    subduct factor riding along. gate_stack: tuple of G [N,D] gates;
    rem_gate: [M,G].

    The loop state is G separate 1-D [N] arrays per quantity. A [N,G]
    (or transposed [G,N]) carry lets XLA's layout assignment put G in the
    lane dimension — pad 2→128, 64x the bandwidth — and in the big fused
    program it DID (layout {0,1} on f32[2,N], measured 31 ms/pass vs ~1 ms
    for the same math over clean 1-D arrays; the 2.1 s stress stage of the
    round-1 7 s planet). 1-D f32[N] has exactly one layout. Band shifts are
    static slices of a pre-doubled [2N] array (jnp.roll's concat made XLA
    insert per-band layout-conversion copies); gates ride as f32 compared
    inline (a stored pred's (8,128)(4,1) tiling forced copies on every
    jnp.where against f32 operands)."""
    G = stress.shape[1]
    npad = stress.shape[0]
    sts = tuple(stress[:, g].astype(jnp.float32) for g in range(G))
    sfs = tuple(subduct[:, g].astype(jnp.float32) for g in range(G))
    ocs = tuple(ocean_cell[:, g] for g in range(G))
    gates = tuple(gf.astype(jnp.float32) for gf in gate_stack)   # [N,D] f32
    rem_real = rem_src < npad
    src_c = jnp.clip(rem_src, 0, npad - 1)
    rgs = tuple(rem_gate[:, g] & rem_real for g in range(G))
    acts0 = tuple(st > 0.01 for st in sts)

    def cond(state):
        i, _, _, _, changed = state
        return changed & (i < num_passes)

    def body(state):
        i, sts, sfs, acts, _ = state
        new_st, new_sf, new_act = [], [], []
        any_upd = jnp.bool_(False)
        for g in range(G):
            st, sf, active = sts[g], sfs[g], acts[g]
            eff = jnp.where(sf > 0.5, subduct_decay, decay)
            prop = st * eff
            sendable = active & (~ocs[g]) & (prop >= 0.005)
            key = jnp.where(sendable, prop, -jnp.inf)
            key_dbl = jnp.concatenate([key, key])
            sf_dbl = jnp.concatenate([sf, sf])
            best = jnp.full_like(st, -jnp.inf)
            bsf = jnp.zeros_like(sf)
            for d, off in enumerate(band_off):
                s0 = off % npad
                gm = gates[g][:, d] > 0.5
                k = jnp.where(gm, jax.lax.slice_in_dim(key_dbl, s0,
                                                       s0 + npad), -jnp.inf)
                u = k > best
                best = jnp.where(u, k, best)
                bsf = jnp.where(u, jax.lax.slice_in_dim(sf_dbl, s0,
                                                        s0 + npad), bsf)
            # remainder edges (~0.5%): scatter-max + two-phase payload pick
            rk = jnp.where(rgs[g], key[rem_dst], -jnp.inf)       # [M]
            w = jnp.full((npad,), -jnp.inf, st.dtype)
            w = w.at[rem_src].max(rk, mode="drop")
            is_win = rgs[g] & (rk == w[src_c])
            cand = jnp.where(is_win, sf[rem_dst], -jnp.inf)
            wsf = jnp.full((npad,), -jnp.inf, sf.dtype)
            wsf = wsf.at[rem_src].max(cand, mode="drop")
            u = w > best
            best = jnp.where(u, w, best)
            bsf = jnp.where(u, wsf, bsf)

            upd = best > st
            new_st.append(jnp.where(upd, best, st))
            new_sf.append(jnp.where(upd, bsf, sf))
            new_act.append(active | upd)
            any_upd = any_upd | jnp.any(upd)
        return i + 1, tuple(new_st), tuple(new_sf), tuple(new_act), any_upd

    _, sts, sfs, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), sts, sfs, acts0, jnp.bool_(True)))
    return jnp.stack(sts, 1), jnp.stack(sfs, 1)


def rem_gate_eq(cell_value, rem_src, rem_dst):
    """[M(,F)] remainder-edge equality gate matching :func:`band_gate`."""
    npad = cell_value.shape[0]
    src = jnp.clip(rem_src, 0, npad - 1)
    return (cell_value[src] == cell_value[rem_dst]) & \
        _expand(_rem_real(rem_src, npad), cell_value)


@partial(jax.jit, static_argnames=("band_off", "max_hops", "num_carry"))
def band_bfs_banded(seeds, carried, band_off, band_mask, rem_src, rem_dst,
                    max_hops: int, hops_cap=None, allow=None,
                    gate=None, rem_gate=None, tie=None, num_carry: int = 0,
                    gate_mix=None):
    """Banded drop-in for ops.graph.band_bfs: F carry-propagating BFS bands
    in one roll-sweep loop.

    - seeds [N,F] bool; carried [C,N,F] f32; tie [N,F] (higher wins among
      equal distances); hops_cap [F] i32; allow [N,F] receiver-side mask.
    - gate [N,D,F] / rem_gate [M,F]: per-edge constraint (e.g. same plate),
      built once with band_gate/rem_gate_eq and stacked per field.

    The (dist, tie) pair packs into one float key (dist*2 - tie, tie∈[0,1])
    and is re-derived from the winning key, so only the carries roll as
    payloads. Ties across equal keys resolve by band order (the gather form
    used slot order) — deterministic either way. Loop state is flat [F*N]
    (see the flat-helper block above for why not [N,F]).
    """
    import numpy as np

    n, f = seeds.shape
    nf = n * f
    c = max(num_carry, 0)
    inf_i = jnp.int32(max_hops + 1)
    dist0 = jnp.where(_flat(seeds), 0, inf_i).astype(jnp.int32)
    if hops_cap is None:
        cap_f = jnp.full((nf,), max_hops, jnp.int32)
    elif isinstance(hops_cap, np.ndarray):
        # host cap → a host literal (never a device constant: PERF_NOTES
        # round-4 — tiny device-constant fetches cost ~80 s at lowering)
        cap_f = jnp.asarray(np.repeat(np.asarray(hops_cap, np.int32), n))
    else:
        cap_f = jnp.repeat(jnp.asarray(hops_cap, jnp.int32), n,
                           total_repeat_length=nf)
    allow_f = jnp.ones((nf,), bool) if allow is None else _flat(allow)
    tie_f = jnp.zeros((nf,), jnp.float32) if tie is None else _flat(tie)
    carr0 = tuple(jnp.zeros((nf,), jnp.float32) if carried is None
                  else _flat(carried[j]) for j in range(c))

    # per-band flat gates [FN] (loop-invariant): per-field equality gate
    # where requested, the plain band mask otherwise
    if gate_mix is not None:
        eq, use = gate_mix
        fgate = tuple(jnp.concatenate(
            [jnp.where(use[g], eq[:, d], band_mask[:, d]) for g in range(f)])
            for d in range(len(band_off)))
    elif gate is not None:
        fgate = tuple(_flat(gate[:, d, :]) for d in range(len(band_off)))
    else:
        fgate = _flat_masks(band_mask, band_off, f)

    src_f, dst_f, srcc_f, real_f = _flat_rem(rem_src, rem_dst, n, f)
    rg_f = real_f if rem_gate is None else (_flat(rem_gate) & real_f)

    def pack(d, t):
        return d.astype(jnp.float32) * 2.0 - t

    def cond(state):
        i, _, _, _, changed = state
        return changed & (i < max_hops)

    def body(state):
        i, dist, tie_c, carr, _ = state
        nd_src = dist + 1
        # source-side key: inf when this cell's value can't propagate
        # (dist+1 over the per-field cap folds the cap check into the key)
        key_src = jnp.where(nd_src <= cap_f, pack(nd_src, tie_c), jnp.inf)
        key_dbl = jnp.concatenate([key_src, key_src])
        carr_dbl = [jnp.concatenate([p, p]) for p in carr]
        best_key = jnp.full((nf,), jnp.inf)
        best_pay = [jnp.zeros((nf,), jnp.float32) for _ in range(c)]
        for d, off in enumerate(band_off):
            k = jnp.where(fgate[d], _dbl_shift(key_dbl, off, nf), jnp.inf)
            u = k < best_key
            best_key = jnp.where(u, k, best_key)
            best_pay = [jnp.where(u, _dbl_shift(pd, off, nf), bp)
                        for pd, bp in zip(carr_dbl, best_pay)]
        # remainder edges: scatter-min winner key + two-phase payload pick
        rk = jnp.where(rg_f, key_src[dst_f], jnp.inf)
        w = jnp.full((nf,), jnp.inf)
        w = w.at[src_f].min(rk, mode="drop")
        is_win = rg_f & (rk == w[srcc_f])
        u = w < best_key
        best_key = jnp.where(u, w, best_key)

        def pick(p):
            cand = jnp.where(is_win, p[dst_f], -jnp.inf)
            out = jnp.full((nf,), -jnp.inf, p.dtype)
            return out.at[src_f].max(cand, mode="drop")

        best_pay = [jnp.where(u, pick(p), bp)
                    for p, bp in zip(carr, best_pay)]

        adopt = (best_key < pack(dist, tie_c)) & allow_f
        new_dist = jnp.where(
            adopt, jnp.ceil(best_key / 2.0).astype(jnp.int32), dist)
        new_tie = jnp.where(adopt, new_dist.astype(jnp.float32) * 2.0
                            - best_key, tie_c)
        new_carr = tuple(jnp.where(adopt, bp, p)
                         for p, bp in zip(carr, best_pay))
        return i + 1, new_dist, new_tie, new_carr, jnp.any(adopt)

    _, dist, tie_out, carr, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), dist0, tie_f, carr0, jnp.bool_(True))
    )
    dist_out = jnp.where(dist > cap_f, jnp.inf, dist.astype(jnp.float32))
    carr_out = (jnp.stack([_unflat(p, n) for p in carr])
                if c else (jnp.zeros((1, n, f), jnp.float32)
                           if carried is None else carried))
    return _unflat(dist_out, n), _unflat(tie_out, n), carr_out


def connected_components_gated(labels_eq, band_off, band_mask, rem_src,
                               rem_dst):
    """Min-label connected components over edges whose endpoints share the
    same ``labels_eq`` value (banded replacement for ops.graph.
    connected_components with an equality relation). Returns [N] i32.

    Convergence note: plain per-cell min propagation + pointer jumping is
    LINEAR in the component diameter on this mesh (measured 505 iterations
    for the planet-spanning ocean at 1M cells — the min label must crawl
    along ring boundaries where the jump chains are short-range). Both
    impls therefore HOOK: each cell scatter-mins its new label into its
    previous parent's label slot, so when two locally-converged regions
    touch anywhere, one root adopts the other and the next compression
    relabels the whole region — O(log) region merges. The pallas impl
    additionally runs 8 local sweeps per dispatch (same kernel as the BFS).
    Fixpoint (component-min labels) is schedule-independent, so all paths
    agree exactly."""
    from .sweep_pallas import use_pallas

    n = band_mask.shape[0]
    if use_pallas(n) and n < (1 << 24):
        gate = band_gate(labels_eq, band_off, band_mask)
        rem_ok = rem_gate_eq(labels_eq, rem_src, rem_dst)
        init = jnp.arange(n, dtype=jnp.float32)
        member = jnp.ones(n, bool)
        return _cc_core_pallas(init, member, gate, rem_ok, band_off,
                               rem_src, rem_dst)
    return _cc_gated_jnp(labels_eq, band_off, band_mask, rem_src, rem_dst)


@partial(jax.jit, static_argnames=("band_off",))
def _cc_gated_jnp(labels_eq, band_off, band_mask, rem_src, rem_dst):
    n = band_mask.shape[0]
    gate = band_gate(labels_eq, band_off, band_mask)
    rgate = rem_gate_eq(labels_eq, rem_src, rem_dst)
    init = jnp.arange(n, dtype=jnp.int32)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        labels, _ = state
        best = jnp.full(n, n, labels.dtype)
        for d, off in enumerate(band_off):
            best = jnp.minimum(best, jnp.where(gate[:, d],
                                               band_shift(labels, off), n))
        rem_lab = jnp.where(rgate, labels[rem_dst], n)
        best = best.at[rem_src].min(rem_lab, mode="drop")
        new = jnp.minimum(labels, jnp.where(best < n, best, labels))
        # hook: merge whole regions where their frontiers touched (see
        # connected_components_gated docstring), then compress twice
        new = new.at[labels].min(new)
        new = new[new]
        new = new[new]
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True)))
    return labels


@partial(jax.jit, static_argnames=("band_off",))
def _cc_core_pallas(init_lab, member, gate, rem_ok, band_off,
                    rem_src, rem_dst):
    """Shared pallas components core: local gated min sweeps (8 per
    dispatch on the VMEM halo window) + root hooking + 2x compression per
    iteration. ``init_lab`` [NP] f32 (== NP at non-members), ``gate``
    [NP,D] gated band masks, ``rem_ok`` [M] gated remainder edges.
    Labels are f32 cell indices (exact below 2^24). Returns [NP] i32
    (NP at non-members)."""
    from .sweep_pallas import BfsSweeper

    npad = gate.shape[0]
    big = jnp.float32(npad)
    sw = BfsSweeper(band_off, 1, npad, cap=None)
    cost = jnp.zeros((npad,), jnp.float32)
    lab_p, cost_p, bits = sw.prep(init_lab, gate, cost)

    dst_c = jnp.clip(rem_dst, 0, npad - 1)
    src_p = jnp.where((rem_src < npad) & rem_ok, rem_src, sw.np8)
    member_p = jnp.pad(member, (0, sw.np8 - npad))
    inf = jnp.float32(jnp.inf)

    def cond(state):
        return state[1]

    def body(state):
        prev, _ = state
        new, _ = sw.sweep(prev, bits, cost_p)
        cand = jnp.where(rem_ok, prev[dst_c], inf)
        new = new.at[src_p].min(cand, mode="drop")
        # hook into the previous parent's slot (non-members' parent == NP
        # maps past np8 and drops), then compress twice
        parent = jnp.where(prev < big, prev,
                           jnp.float32(sw.np8)).astype(jnp.int32)
        new = new.at[parent].min(new, mode="drop")
        idx = jnp.clip(new, 0, npad - 1).astype(jnp.int32)
        new = jnp.where(member_p, new[idx], new)
        idx = jnp.clip(new, 0, npad - 1).astype(jnp.int32)
        new = jnp.where(member_p, new[idx], new)
        return new, jnp.any(new != prev)

    lab, _ = jax.lax.while_loop(cond, body, (lab_p, jnp.bool_(True)))
    lab = lab[:npad]
    return jnp.where(member, lab, big).astype(jnp.int32)


@partial(jax.jit, static_argnames=("band_off",))
def flood_assign_banded(value, frontier, band_off, band_mask, rem_src,
                        rem_dst):
    """Banded drop-in for ops.graph.flood_assign: propagate ``value``
    outward from ``frontier`` cells to all reachable unassigned cells,
    breadth-first, ties toward the min value."""
    big = jnp.iinfo(jnp.int32).max

    def cond(state):
        _, reached, changed = state
        return changed

    def body(state):
        val, reached, _ = state
        masked = jnp.where(reached, val, big)
        best = banded_min(masked, band_off, band_mask, rem_src, rem_dst,
                          fill=big)
        newly = (~reached) & (best < big)
        val = jnp.where(newly, best, val)
        return val, reached | newly, jnp.any(newly)

    val, reached, _ = jax.lax.while_loop(
        cond, body, (value, frontier, jnp.bool_(True))
    )
    return val, reached


@partial(jax.jit, static_argnames=("band_off",))
def compute_gradients_banded(pos, field, east, north,
                             band_off, band_mask, rem_src, rem_dst):
    """Banded least-squares tangent gradients (drop-in for
    climate.util.compute_gradients; js/wind.js:306-339 parity).

    Every per-edge quantity decomposes into neighbor sums of per-cell
    fields:  Σ de² = eᵀ M e  with  M = Σ p_jp_jᵀ - p_i Σp_jᵀ - (Σp_j)p_iᵀ
    + deg·p_ip_iᵀ,  and  Σ de·df = e·(Σ f_jp_j - f_i Σp_j - p_i Σf_j
    + deg f_i p_i) — so the whole stencil is ONE stacked banded_sum."""
    n = pos.shape[0]
    f2 = field if field.ndim == 2 else field[:, None]
    nf = f2.shape[1]
    # upper-triangle of p pᵀ (6), p (3), f (F), f·p (3F)
    pp = jnp.stack([pos[:, 0] * pos[:, 0], pos[:, 0] * pos[:, 1],
                    pos[:, 0] * pos[:, 2], pos[:, 1] * pos[:, 1],
                    pos[:, 1] * pos[:, 2], pos[:, 2] * pos[:, 2]], axis=1)
    fp = (f2[:, :, None] * pos[:, None, :]).reshape(n, 3 * nf)
    stack = jnp.concatenate([pp, pos, f2, fp], axis=1)
    s = banded_sum(stack, band_off, band_mask, rem_src, rem_dst)
    deg = banded_count(band_mask, rem_src, dtype=jnp.float32)

    s_pp, s_p = s[:, :6], s[:, 6:9]
    s_f, s_fp = s[:, 9:9 + nf], s[:, 9 + nf:].reshape(n, nf, 3)

    def quad(v):  # vᵀ M v with M from the sums
        vpp = (v[:, 0] * v[:, 0] * s_pp[:, 0]
               + 2 * v[:, 0] * v[:, 1] * s_pp[:, 1]
               + 2 * v[:, 0] * v[:, 2] * s_pp[:, 2]
               + v[:, 1] * v[:, 1] * s_pp[:, 3]
               + 2 * v[:, 1] * v[:, 2] * s_pp[:, 4]
               + v[:, 2] * v[:, 2] * s_pp[:, 5])
        vp = jnp.einsum("nc,nc->n", v, pos)
        vsp = jnp.einsum("nc,nc->n", v, s_p)
        return vpp - 2 * vp * vsp + deg * vp * vp

    def cross(v):  # Σ de·df per field: [N,F]
        vfp = jnp.einsum("nfc,nc->nf", s_fp, v)
        vp = jnp.einsum("nc,nc->n", v, pos)
        vsp = jnp.einsum("nc,nc->n", v, s_p)
        return (vfp - f2 * vsp[:, None] - vp[:, None] * s_f
                + deg[:, None] * f2 * vp[:, None])

    sum_ee, sum_nn = quad(east), quad(north)
    sum_ep, sum_np = cross(east), cross(north)
    ge = jnp.where(sum_ee[:, None] > 1e-12,
                   sum_ep / jnp.maximum(sum_ee, 1e-20)[:, None], 0.0)
    gn = jnp.where(sum_nn[:, None] > 1e-12,
                   sum_np / jnp.maximum(sum_nn, 1e-20)[:, None], 0.0)
    if field.ndim == 1:
        ge, gn = ge[:, 0], gn[:, 0]
    return ge.astype(jnp.float32), gn.astype(jnp.float32)
