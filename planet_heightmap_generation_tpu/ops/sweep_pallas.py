"""Pallas TPU kernels for the banded neighbor-sweep loops.

The banded jnp path (ops/banded.py) lowers each sweep to ~32 masked
`jnp.roll` + select + min passes; XLA materializes enough intermediates
that one 1M-cell 5-field sweep costs ~7 ms against a ~0.15 ms roofline
(~20 MB of state). Every hot loop in the pipeline — the elevation /
climate multi-field BFS, the priority-flood ε-fill, stress propagation,
smoothing — is sweeps, so this module implements ONE Pallas kernel shape
for all of them:

  - the field lives in HBM as a flat [F*N] f32 loop carry (1-D carries are
    immune to XLA layout assignment, PERF_NOTES round 6) and is padded +
    viewed as [F, NP8] row-major ONCE around the whole while loop (NP8 =
    N rounded up to the 8192-cell block; padding is baked inert);
  - the grid walks 8192-cell column blocks; each step reads the block and
    its 2H neighbors (H = halo blocks covering max |band offset|, which
    grows ~3.6·sqrt(N): 3571 at 1M, H=1 up to ~8M cells), so a shifted
    read `field[i + off]` is a STATIC row slice + two `pltpu.roll` lane
    rotations of the VMEM window — no gathers, no per-band intermediates;
  - the ~32 band masks are packed into ONE [N] uint32 bitmask (bit d =
    band d present), read once per block instead of 32 bool planes;
  - barrier/seed semantics are BAKED into the inputs (cost=+inf at
    barriers, dist0=0 at seeds; flood freezes cells by clamping the relax
    target to the frozen surface), so the loop body touches only
    dist + bits + cost;
  - the remainder edges (~0.3-0.6 % of edges: pole fan + jitter outliers)
    are applied OUTSIDE the kernel on [M]-sized gathers — exact, cheap;
  - each block writes a change flag; the while-loop early exit reads the
    [G] flag vector instead of re-scanning the field.

Results are bit-identical to the banded jnp path (min is order-independent
and the cost add is performed identically).

The kernels are TPU-only: the CPU test backend and the sharded (mesh)
engine path use the jnp fallback — `use_pallas()` gates at trace time, and
`no_pallas()` scopes the sharded/vmapped paths (a pallas_call cannot be
auto-partitioned by XLA).
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

BLOCK = 8192
_LANE = 128

_FORCED_OFF = 0
_FORCED_ON = 0


@contextmanager
def no_pallas():
    """Scope that forces the jnp fallback (sharded / vmapped paths)."""
    global _FORCED_OFF
    _FORCED_OFF += 1
    try:
        yield
    finally:
        _FORCED_OFF -= 1


@contextmanager
def force_pallas():
    """Scope that forces the pallas path even on CPU — for tests, paired
    with pltpu.force_tpu_interpret_mode()."""
    global _FORCED_ON
    _FORCED_ON += 1
    try:
        yield
    finally:
        _FORCED_ON -= 1


# Cell-count ceiling for the pallas sweep kernels. The "4M device fault"
# that first pointed here turned out to be HBM exhaustion of the single
# fused program (temps 15.3 GB vs 16 GB on v5e — engine.FUSED_MAX_CELLS
# now routes big planets to the staged path; PERF_NOTES round 11), not a
# pallas bug: every pallas kernel passes standalone at 4M. The ceiling
# therefore sits at the f32-index exactness bound shared by the label
# kernels; PLANET_PALLAS_MAX_CELLS can lower it for experiments.
_N_MAX = int(os.environ.get("PLANET_PALLAS_MAX_CELLS", 1 << 24))


def use_pallas(n: int = 0) -> bool:
    """True iff the pallas sweep kernels should be traced (TPU backend,
    not inside no_pallas(), not disabled by PLANET_PALLAS=0, and — when
    the caller passes its cell count — not beyond the 4M-fault ceiling)."""
    if _FORCED_OFF or os.environ.get("PLANET_PALLAS", "1") == "0":
        return False
    if _FORCED_ON:
        return True
    if n > _N_MAX:
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def pack_band_bits(band_mask) -> jax.Array:
    """[N, D≤32] bool band masks → [N] uint32 bitmask (bit d = band d)."""
    d = band_mask.shape[1]
    assert d <= 32, d
    weights = (np.uint32(1) << np.arange(d, dtype=np.uint32))
    return jnp.sum(band_mask.astype(jnp.uint32) * weights, axis=1,
                   dtype=jnp.uint32)


def _halo_for(band_off, block: int = BLOCK) -> int:
    """Halo blocks per side: H·block must cover max |offset| + one lane
    row (the shift slicing reads rows a..a+rows+1 of the window)."""
    m = max(abs(int(o)) for o in band_off)
    h = -(-(m + _LANE) // block)
    return h


def _halo_for_inner(band_off, inner: int, f: int) -> int:
    """Halo sized so ``inner`` sweeps can actually propagate ``inner``
    hops before hitting stale halo: one mesh hop moves ~max|offset| cells
    along the spiral, so with the minimal halo (1 block at 1M, where
    max|off| ≈ 3571) the wavefront crosses at most ~BLOCK/max|off| ≈ 2.3
    hops per dispatch and the remaining inner sweeps burn VPU for nothing.

    ``f`` counts the HALO'D field rows (a kernel with two halo'd input
    arrays passes their sum). The window budget is 1.6 MB: Mosaic's
    scoped-VMEM stack peaks at ~8× the window bytes against a hard 16 MB
    limit — measured at 4M cells, f=5: h=6 (2.1 MB window) fails the
    compile at 17.0 MB, h=4 (1.5 MB) fits."""
    m = max(abs(int(o)) for o in band_off)
    want = -(-(inner * m + _LANE) // BLOCK)
    vmem_cap = max(1, int((1.6 * 2 ** 20 / (f * BLOCK * 4) - 1) // 2))
    return max(_halo_for(band_off), min(want, vmem_cap, 6))


def _pad_cols(x2, np8):
    n = x2.shape[1]
    if n == np8:
        return x2
    return jnp.pad(x2, ((0, 0), (0, np8 - n)))


def _shifted(win, s: int, rows: int):
    """win: [F, W, 128] VMEM window (flat row-major view). Returns
    [F, rows, 128] r where r[f, i, j] = win_flat[f, s + i*128 + j] —
    a static row slice + two lane rotations (s is static per band)."""
    from jax.experimental.pallas import tpu as pltpu

    a, b = divmod(s, _LANE)
    r1 = win[:, a:a + rows]
    if b == 0:
        return r1
    r2 = win[:, a + 1:a + 1 + rows]
    rolled1 = pltpu.roll(r1, _LANE - b, axis=2)
    rolled2 = pltpu.roll(r2, _LANE - b, axis=2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _LANE), 2)
    return jnp.where(lane < _LANE - b, rolled1, rolled2)


def _window(refs, f: int):
    """Assemble the [F, (2H+1)*rows, 128] halo window from 2H+1 blocks."""
    w = jnp.concatenate([r[:] for r in refs], axis=1)
    return w.reshape(f, w.shape[1] // _LANE, _LANE)


def _make_bfs_kernel(offs, h: int, inner: int, cap):
    """BFS min-plus kernel running ``inner`` sweeps per call on the
    VMEM-resident window. Inner sweeps update only the center block and
    read progressively stale halo values — a chaotic (asynchronous)
    relaxation: the update is monotone decreasing and stale values are
    older = higher, so every inner sweep stays a valid upper bound and the
    outer while-loop still converges to the SAME unique fixpoint, in ~S×
    fewer kernel dispatches (each dispatch is latency-bound at ~1.4 ms;
    the DMA traffic is identical).

    ``cap`` (static float or None) clamps VALUES at the consumers'
    saturation point: fixpoint = min(true_dist, cap) — exact below cap
    (distances only grow along a path, so clamping never blocks a sub-cap
    path) and convergence is bounded by ~cap/min_cost hops instead of the
    mesh diameter."""
    def kernel(*refs):
        dist_refs = refs[:2 * h + 1]
        bits_ref, cost_ref, out_ref, chg_ref = refs[2 * h + 1:]
        f, b = dist_refs[h].shape
        rows = b // _LANE
        lw = _window(dist_refs[:h], f) if h else None
        rw = _window(dist_refs[h + 1:], f) if h else None
        cur = dist_refs[h][:].reshape(f, rows, _LANE)
        dist0 = cur
        bit = bits_ref[:].reshape(1, rows, _LANE)
        cost = cost_ref[:].reshape(f, rows, _LANE)
        inf = jnp.float32(jnp.inf)
        for _ in range(inner):
            win = (jnp.concatenate([lw, cur, rw], axis=1) if h else cur)
            best = jnp.full_like(cur, inf)
            for d, off in enumerate(offs):
                sh = _shifted(win, h * b + off, rows)
                m = ((bit >> np.uint32(d)) & np.uint32(1)) > 0
                best = jnp.minimum(best, jnp.where(m, sh, inf))
            new = jnp.minimum(cur, best + cost)
            if cap is not None:
                new = jnp.minimum(new, jnp.float32(cap))
            cur = new
        out_ref[:] = cur.reshape(f, b)
        _accum_changed(chg_ref, cur, dist0)
    return kernel


def _accum_changed(chg_ref, new, old):
    """OR a block's change flag into the single (1,1) SMEM accumulator
    (the TPU grid is sequential, so read-modify-write is safe)."""
    from jax.experimental import pallas as pl

    local = jnp.any(new != old).astype(jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        chg_ref[0, 0] = local

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        chg_ref[0, 0] = jnp.maximum(chg_ref[0, 0], local)


def _make_flood_kernel(offs, h: int, big: float, eps: float, inner: int):
    """ε-fill kernel running ``inner`` sweeps per call (see
    _make_bfs_kernel for the stale-halo convergence argument — the fill's
    fixpoint is unique, so the result is the same surface)."""
    def kernel(*refs):
        k = 2 * h + 1
        surf_refs = refs[:k]
        inl_refs = refs[k:2 * k]
        elevb_ref, bits_ref, out_ref, chg_ref = refs[2 * k:]
        f, b = surf_refs[h].shape
        rows = b // _LANE
        lw = _window(surf_refs[:h], f) if h else None
        rw = _window(surf_refs[h + 1:], f) if h else None
        iw = _window(inl_refs, f)
        cur = surf_refs[h][:].reshape(f, rows, _LANE)
        surf0 = cur
        elevb = elevb_ref[:].reshape(f, rows, _LANE)
        bit = bits_ref[:].reshape(1, rows, _LANE)
        inf = jnp.float32(jnp.inf)
        for _ in range(inner):
            win = (jnp.concatenate([lw, cur, rw], axis=1) if h else cur)
            masked = jnp.where(iw > 0, jnp.float32(big), win)
            best = jnp.full_like(cur, inf)
            for d, off in enumerate(offs):
                sh = _shifted(masked, h * b + off, rows)
                m = ((bit >> np.uint32(d)) & np.uint32(1)) > 0
                best = jnp.minimum(best, jnp.where(m, sh, inf))
            cand = jnp.maximum(elevb, best + jnp.float32(eps))
            cur = jnp.minimum(cur, cand)
        out_ref[:] = cur.reshape(f, b)
        _accum_changed(chg_ref, cur, surf0)
    return kernel


def _specs(f: int, g: int, h: int, block: int = BLOCK):
    """2h+1 clamped halo blocks (h=0 → single center block)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bs = (f, block)
    specs = []
    for k in range(-h, h + 1):
        if k == 0:
            im = lambda i: (0, i)  # noqa: E731
        else:
            im = lambda i, k=k: (0, jnp.clip(i + k, 0, g - 1))  # noqa: E731
        specs.append(pl.BlockSpec(bs, im, memory_space=pltpu.VMEM))
    return specs


def _call(kernel, n_out_f, g, in_specs, args):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out_specs = (
        pl.BlockSpec((n_out_f, BLOCK), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((n_out_f, g * BLOCK), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(*args)


class BfsSweeper:
    """Reusable BFS sweep for one (band_off, f, n) shape family.

    Pads [F*N]→[F,NP8] once (`prep`), runs `sweep` per while-loop
    iteration on the padded carry, and `finish` slices the result back.
    Padding cells are inert: dist=+inf, cost=+inf, bits=0."""

    def __init__(self, band_off, f: int, n: int, inner: int = 8,
                 cap=None):
        self.band_off = tuple(band_off)
        self.f = f
        self.n = n
        self.inner = inner
        self.np8 = -(-n // BLOCK) * BLOCK
        self.g = self.np8 // BLOCK
        self.h = min(_halo_for_inner(band_off, inner, f),
                     max(1, self.g - 1))
        self._kernel = _make_bfs_kernel(self.band_off, self.h, inner, cap)

    def prep(self, dist_flat, band_mask, cost_flat):
        inf = jnp.float32(jnp.inf)
        d2 = _pad_cols(dist_flat.reshape(self.f, self.n), self.np8)
        if self.np8 != self.n:
            d2 = d2.at[:, self.n:].set(inf)
        c2 = _pad_cols(cost_flat.reshape(self.f, self.n), self.np8)
        if self.np8 != self.n:
            c2 = c2.at[:, self.n:].set(inf)
        bits = _pad_cols(pack_band_bits(band_mask).reshape(1, self.n),
                         self.np8)
        return d2.reshape(-1), c2.reshape(-1), bits

    def sweep(self, dist_pad_flat, bits, cost_pad_flat):
        """One band sweep on the padded flat carry → (new, chg [G,1])."""
        d2 = dist_pad_flat.reshape(self.f, self.np8)
        c2 = cost_pad_flat.reshape(self.f, self.np8)
        specs = (_specs(self.f, self.g, self.h)
                 + _specs(1, self.g, 0) + _specs(self.f, self.g, 0))
        args = tuple([d2] * (2 * self.h + 1)) + (bits, c2)
        new, chg = _call(self._kernel, self.f, self.g, specs, args)
        return new.reshape(-1), chg

    def finish(self, dist_pad_flat):
        """Padded flat carry → [N, F] (the public BFS result shape)."""
        d2 = dist_pad_flat.reshape(self.f, self.np8)[:, :self.n]
        return d2.T


class FloodSweeper:
    """Reusable ε-fill sweep (single field). Padding cells frozen at 0."""

    def __init__(self, band_off, n: int, big: float, eps: float,
                 inner: int = 8):
        self.band_off = tuple(band_off)
        self.n = n
        self.inner = inner
        self.np8 = -(-n // BLOCK) * BLOCK
        self.g = self.np8 // BLOCK
        # two halo'd single-field inputs (surface + inland) -> 4 halo'd
        # rows total for the VMEM budget
        self.h = min(_halo_for_inner(band_off, inner, 4),
                     max(1, self.g - 1))
        self._kernel = _make_flood_kernel(self.band_off, self.h, big, eps,
                                          inner)

    def prep(self, surf, inland, elev_baked, band_mask):
        s2 = _pad_cols(surf.reshape(1, self.n), self.np8)
        i2 = _pad_cols(inland.astype(jnp.float32).reshape(1, self.n),
                       self.np8)
        e2 = _pad_cols(elev_baked.reshape(1, self.n), self.np8)
        bits = _pad_cols(pack_band_bits(band_mask).reshape(1, self.n),
                         self.np8)
        return s2.reshape(-1), i2, e2, bits

    def sweep(self, surf_pad, inland2, elevb2, bits):
        s2 = surf_pad.reshape(1, self.np8)
        k = 2 * self.h + 1
        specs = (_specs(1, self.g, self.h) + _specs(1, self.g, self.h)
                 + _specs(1, self.g, 0) + _specs(1, self.g, 0))
        args = tuple([s2] * k) + tuple([inland2] * k) + (elevb2, bits)
        new, chg = _call(self._kernel, 1, self.g, specs, args)
        return new.reshape(-1), chg

    def finish(self, surf_pad):
        return surf_pad.reshape(self.np8)[: self.n]


def _make_stress_kernel(offs, h: int, decay: float, sub_decay: float,
                        inner: int):
    """Stress-propagation kernel (elevation/collisions stress relax): per
    sweep each cell adopts the strongest propagated stress among gated
    same-plate neighbors, the subduct factor riding along as an argmax
    payload. The synchronous process equals the fixpoint
    ``st(i) = max over origins s: st0(s) · eff(s)^hops(s,i)`` (a cell that
    adopts also adopts the ORIGIN's sf, so its outgoing decay rate is the
    origin's — path-independent), which is monotone-increasing, so the
    stale-halo inner-sweep argument of _make_bfs_kernel applies unchanged.
    Exact ties between distinct origins resolve by arrival schedule here
    vs band order in the jnp loop (measure-zero for real float products).

    State refs: [4, B] halo'd (st, sf, act, ocean); bits [1,B] gated band
    mask. Sender gate: act>0 & ~ocean & prop ≥ 0.005; receivers adopt on
    strict improvement and become active."""
    def kernel(*refs):
        k = 2 * h + 1
        s_refs = refs[:k]
        bits_ref, out_ref, chg_ref = refs[k:]
        f, b = s_refs[h].shape
        rows = b // _LANE
        lw = _window(s_refs[:h], f) if h else None
        rw = _window(s_refs[h + 1:], f) if h else None
        cur = s_refs[h][:].reshape(f, rows, _LANE)
        st0_all = cur
        bit = bits_ref[:].reshape(1, rows, _LANE)
        ninf = jnp.float32(-jnp.inf)
        for _ in range(inner):
            win = (jnp.concatenate([lw, cur, rw], axis=1) if h else cur)
            st, sf, act = cur[0], cur[1], cur[2]
            best = jnp.full_like(st, ninf)
            bsf = jnp.zeros_like(sf)
            for d, off in enumerate(offs):
                sh = _shifted(win, h * b + off, rows)
                n_st, n_sf, n_act, n_oc = sh[0], sh[1], sh[2], sh[3]
                eff = jnp.where(n_sf > 0.5, jnp.float32(sub_decay),
                                jnp.float32(decay))
                prop = n_st * eff
                ok = (((bit[0] >> np.uint32(d)) & np.uint32(1)) > 0) \
                    & (n_act > 0) & (n_oc <= 0) & (prop >= 0.005)
                key = jnp.where(ok, prop, ninf)
                u = key > best
                best = jnp.where(u, key, best)
                bsf = jnp.where(u, n_sf, bsf)
            upd = best > st
            st = jnp.where(upd, best, st)
            sf = jnp.where(upd, bsf, sf)
            act = jnp.maximum(act, upd.astype(jnp.float32))
            cur = jnp.stack([st, sf, act, cur[3]])
        out_ref[:] = cur.reshape(f, b)
        _accum_changed(chg_ref, cur[:3], st0_all[:3])
    return kernel


class StressSweeper:
    """Stress relax for one (band_off, n) family; one layer per instance
    (layers have distinct same-plate gates). State [4, NP8]: st, sf,
    act(0/1), ocean(0/1 — static); gates ride the packed band bitmask."""

    def __init__(self, band_off, n: int, decay: float, sub_decay: float,
                 inner: int = 8):
        self.band_off = tuple(band_off)
        self.n = n
        self.inner = inner
        self.np8 = -(-n // BLOCK) * BLOCK
        self.g = self.np8 // BLOCK
        self.h = min(_halo_for_inner(band_off, inner, 4),
                     max(1, self.g - 1))
        self._kernel = _make_stress_kernel(self.band_off, self.h,
                                           float(decay), float(sub_decay),
                                           inner)

    def prep(self, st, sf, act, ocean, gate):
        state = jnp.stack([st, sf, act.astype(jnp.float32),
                           ocean.astype(jnp.float32)])
        state = _pad_cols(state, self.np8)
        bits = _pad_cols(pack_band_bits(gate).reshape(1, self.n), self.np8)
        return state.reshape(-1), bits

    def sweep(self, state_flat, bits):
        s2 = state_flat.reshape(4, self.np8)
        specs = _specs(4, self.g, self.h) + _specs(1, self.g, 0)
        args = tuple([s2] * (2 * self.h + 1)) + (bits,)
        new, chg = _call(self._kernel, 4, self.g, specs, args)
        return new.reshape(-1), chg

    def finish(self, state_flat):
        s2 = state_flat.reshape(4, self.np8)[:, :self.n]
        return s2[0], s2[1]


def _make_warp_kernel(offs, h: int, inner: int):
    """Nearest-candidate propagation for the terrain domain warp
    (erosion/warp.py): each cell carries its best source-cell candidate
    (index + position) and adopts any band neighbor's candidate that lies
    closer to its OWN warped target point w. Monotone-decreasing per-cell
    distance → the stale-halo inner-sweep argument applies; the assignment
    at schedule-sensitive cells (two candidates at equal distance within
    float noise) may differ from the synchronous jnp loop by one adjacent
    source cell — sub-edge-length displacement, tolerance-tested.

    Refs: (2h+1) state blocks [4,B] (src_idx, src_pos xyz), w [3,B]
    center-only, bits [1,B], out [4,B], chg."""
    def kernel(*refs):
        k = 2 * h + 1
        s_refs = refs[:k]
        w_ref, bits_ref, out_ref, chg_ref = refs[k:]
        f, b = s_refs[h].shape
        rows = b // _LANE
        lw = _window(s_refs[:h], f) if h else None
        rw = _window(s_refs[h + 1:], f) if h else None
        cur = s_refs[h][:].reshape(f, rows, _LANE)
        cur0 = cur
        w = w_ref[:].reshape(3, rows, _LANE)
        bit = bits_ref[:].reshape(1, rows, _LANE)[0]
        for _ in range(inner):
            win = (jnp.concatenate([lw, cur, rw], axis=1) if h else cur)
            dx = cur[1] - w[0]
            dy = cur[2] - w[1]
            dz = cur[3] - w[2]
            best = dx * dx + dy * dy + dz * dz
            out = cur
            for d, off in enumerate(offs):
                sh = _shifted(win, h * b + off, rows)
                cx = sh[1] - w[0]
                cy = sh[2] - w[1]
                cz = sh[3] - w[2]
                cd = cx * cx + cy * cy + cz * cz
                m = ((bit >> np.uint32(d)) & np.uint32(1)) > 0
                u = m & (cd < best)
                best = jnp.where(u, cd, best)
                out = jnp.where(u[None], sh, out)
            cur = out
        out_ref[:] = cur.reshape(f, b)
        _accum_changed(chg_ref, cur[:1], cur0[:1])
    return kernel


class WarpSweeper:
    """Warp nearest-candidate sweep for one (band_off, n) family.
    State [4, NP8]: src_idx (f32 cell index, exact < 2^24), src_pos xyz;
    targets w [3, NP8] are loop-invariant."""

    def __init__(self, band_off, n: int, inner: int = 8):
        self.band_off = tuple(band_off)
        self.n = n
        self.inner = inner
        self.np8 = -(-n // BLOCK) * BLOCK
        self.g = self.np8 // BLOCK
        self.h = min(_halo_for_inner(band_off, inner, 4),
                     max(1, self.g - 1))
        self._kernel = _make_warp_kernel(self.band_off, self.h, inner)

    def prep(self, pos, w, band_mask):
        n = self.n
        idx = jnp.arange(n, dtype=jnp.float32)
        state = jnp.concatenate([idx[None], pos.T], axis=0)    # [4, N]
        state = _pad_cols(state, self.np8)
        w_p = _pad_cols(w.T, self.np8)
        bits = _pad_cols(pack_band_bits(band_mask).reshape(1, n), self.np8)
        return state.reshape(-1), w_p, bits

    def sweep(self, state_flat, w_p, bits):
        s2 = state_flat.reshape(4, self.np8)
        specs = (_specs(4, self.g, self.h) + _specs(3, self.g, 0)
                 + _specs(1, self.g, 0))
        args = tuple([s2] * (2 * self.h + 1)) + (w_p, bits)
        new, chg = _call(self._kernel, 4, self.g, specs, args)
        return new.reshape(-1), chg

    def finish(self, state_flat):
        s2 = state_flat.reshape(4, self.np8)[:, :self.n]
        return s2[0], s2[1:4].T     # idx [N] f32, pos [N,3]


def _make_smooth_kernel(offs, h: int, masked: bool):
    """Laplacian-smoothing pass: out = (field + Σ_masked nbrs + remsum)·inv,
    restricted to mask cells when ``masked`` (non-mask cells pass through
    and contribute 0 — the smooth_masked_banded semantics). The mask and
    inv planes are [1, N] and broadcast across the F field rows."""
    def kernel(*refs):
        k = 2 * h + 1
        f_refs = refs[:k]
        i = k
        if masked:
            m_refs = refs[i:i + k]
            i += k
        bits_ref, rem_ref, inv_ref, out_ref = refs[i:i + 4]
        f, b = f_refs[h].shape
        rows = b // _LANE
        fw = _window(f_refs, f)
        if masked:
            mw = _window(m_refs, 1)
            contrib = jnp.where(mw > 0, fw, 0.0)
        else:
            contrib = fw
        field = f_refs[h][:].reshape(f, rows, _LANE)
        bit = bits_ref[:].reshape(1, rows, _LANE)
        s = jnp.zeros_like(field)
        for d, off in enumerate(offs):
            sh = _shifted(contrib, h * b + off, rows)
            m = ((bit >> np.uint32(d)) & np.uint32(1)) > 0
            s = s + jnp.where(m, sh, 0.0)
        s = (field + s + rem_ref[:].reshape(f, rows, _LANE)) \
            * inv_ref[:].reshape(1, rows, _LANE)
        if masked:
            mc = m_refs[h][:].reshape(1, rows, _LANE)
            s = jnp.where(mc > 0, s, field)
        out_ref[:] = s.reshape(f, b)
    return kernel


def _call_noflag(kernel, n_out_f, g, in_specs, args, block: int = BLOCK):
    """pallas_call variant without the change-flag output (fixed-pass
    smoothing loops need no early exit)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out_specs = pl.BlockSpec((n_out_f, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_out_f, g * block), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(*args)


def _make_shadow_kernel(offs, h: int, retain_s: float, retain_w: float):
    """Rain-shadow directed sweep (climate/precipitation.py _rain_shadow2):
    state = [4,N] {shadow, windward} x {summer, winter}; per band the
    wind-alignment weights are recomputed IN VMEM from the shifted
    positions/winds (the materialized [N,D,4] weight stack is 512 MB at 1M
    and the lazy jnp recompute is ~2.4 s of XLA intermediates). One sweep
    per dispatch — the propagation is hop-counted (per-hop decay), so
    inner-sweep batching would change semantics.

    Ref layout: (2h+1) state blocks [4,B], (2h+1) aux blocks [9,B]
    (pos xyz, wind_summer xyz, wind_winter xyz), bits [1,B], land [1,B],
    rem_wsum [4,B], rem_wacc [4,B] (remainder contributions scattered
    outside per hop). The per-column hop cap (i < cap4) is applied by the
    caller on the kernel output. Columns 0-1 are shadow (sign −, retain_s),
    2-3 windward (sign +, retain_w) — built in-kernel from an iota
    (pallas kernels cannot capture constant arrays)."""

    def kernel(*refs):
        col = jax.lax.broadcasted_iota(jnp.int32, (4, 1, 1), 0)
        s4 = jnp.where(col < 2, -1.0, 1.0)
        r4 = jnp.where(col < 2, jnp.float32(retain_s),
                       jnp.float32(retain_w))
        k = 2 * h + 1
        s_refs = refs[:k]
        a_refs = refs[k:2 * k]
        bits_ref, land_ref, rws_ref, rwa_ref, out_ref = refs[2 * k:]
        f, b = s_refs[h].shape
        rows = b // _LANE
        sw = _window(s_refs, f)
        aw = _window(a_refs, 9)
        cur = s_refs[h][:].reshape(f, rows, _LANE)
        aux_c = a_refs[h][:].reshape(9, rows, _LANE)
        pos_c = aux_c[:3]
        wind_c = aux_c[3:]
        bit = bits_ref[:].reshape(1, rows, _LANE)
        land = land_ref[:].reshape(1, rows, _LANE) > 0
        wsum = jnp.zeros_like(cur)
        wacc = jnp.zeros_like(cur)
        for d, off in enumerate(offs):
            sh_s = _shifted(sw, h * b + off, rows)
            sh_a = _shifted(aw, h * b + off, rows)
            delta = sh_a[:3] - pos_c
            # up: wind AT the neighbor toward the receiver; dn: wind AT the
            # receiver toward the neighbor (same reductions, same order, as
            # the jnp einsums)
            up0 = -(sh_a[3] * delta[0] + sh_a[4] * delta[1]
                    + sh_a[5] * delta[2])
            up1 = -(sh_a[6] * delta[0] + sh_a[7] * delta[1]
                    + sh_a[8] * delta[2])
            dn0 = (wind_c[0] * delta[0] + wind_c[1] * delta[1]
                   + wind_c[2] * delta[2])
            dn1 = (wind_c[3] * delta[0] + wind_c[4] * delta[1]
                   + wind_c[5] * delta[2])
            w4 = jnp.stack([up0, up1, dn0, dn1])
            m = (((bit >> np.uint32(d)) & np.uint32(1)) > 0) & land
            w4 = jnp.where(m & (w4 > 0), w4, 0.0)
            w = jnp.where(sh_s * s4 > 0, w4, 0.0)
            wsum = wsum + w
            wacc = wacc + w * sh_s
        wsum = wsum + rws_ref[:].reshape(f, rows, _LANE)
        wacc = wacc + rwa_ref[:].reshape(f, rows, _LANE)
        carried = wacc / jnp.maximum(wsum, 1e-20) * r4
        ext = jnp.where(s4 < 0, jnp.minimum(cur, carried),
                        jnp.maximum(cur, carried))
        out_ref[:] = jnp.where(wsum > 0, ext, cur).reshape(f, b)
    return kernel


class ShadowSweeper:
    """Rain-shadow sweep for one (band_off, n) family. State [4, NP8]
    padded; aux (pos+winds) is loop-invariant.

    Uses a SMALLER block than the other sweepers: the kernel's per-band
    temporaries span 13 halo'd field rows (4 state + 9 aux), and at
    BLOCK=8192 the Mosaic scoped-VMEM stack peaks at ~25 MB against the
    16 MB limit (compile error at 1M). 2048-cell blocks keep the same
    total work with a ~6 MB peak."""

    BLOCK_S = 2048

    def __init__(self, band_off, n: int, retain_s: float, retain_w: float):
        self.band_off = tuple(band_off)
        self.n = n
        bs = self.BLOCK_S
        self.np8 = -(-n // bs) * bs
        self.g = self.np8 // bs
        self.h = min(_halo_for(band_off, bs), max(1, self.g - 1))
        self._kernel = _make_shadow_kernel(self.band_off, self.h,
                                           float(retain_s), float(retain_w))

    def pad(self, x2):
        return _pad_cols(x2, self.np8)

    def sweep(self, state_p, aux_p, bits_p, land_p, rws_p, rwa_p):
        k = 2 * self.h + 1
        bs = self.BLOCK_S
        specs = (_specs(4, self.g, self.h, bs) + _specs(9, self.g, self.h, bs)
                 + _specs(1, self.g, 0, bs) + _specs(1, self.g, 0, bs)
                 + _specs(4, self.g, 0, bs) + _specs(4, self.g, 0, bs))
        args = ([state_p] * k + [aux_p] * k
                + [bits_p, land_p, rws_p, rwa_p])
        return _call_noflag(self._kernel, 4, self.g, specs, tuple(args),
                            block=bs)


class SmoothSweeper:
    """Fixed-pass Laplacian smoothing on [F, N] fields (mask optional).

    The caller supplies inv = 1/(1+degree) (or the masked count variant)
    as [F, N]-broadcastable data; remainder-edge neighbor sums are computed
    outside per pass ([M]-sized scatter) and passed in."""

    def __init__(self, band_off, f: int, n: int, masked: bool):
        self.band_off = tuple(band_off)
        self.f = f
        self.n = n
        self.masked = masked
        self.np8 = -(-n // BLOCK) * BLOCK
        self.g = self.np8 // BLOCK
        self.h = _halo_for(band_off)
        self._kernel = _make_smooth_kernel(self.band_off, self.h, masked)

    def pad(self, x2, fill=0.0):
        p = _pad_cols(x2, self.np8)
        if self.np8 != self.n and fill != 0.0:
            p = p.at[:, self.n:].set(fill)
        return p

    def sweep(self, field_p, mask_p, bits_p, rem_p, inv_p):
        k = 2 * self.h + 1
        specs = _specs(self.f, self.g, self.h)
        args = [field_p] * k
        if self.masked:
            specs = specs + _specs(1, self.g, self.h)
            args += [mask_p] * k
        specs = (specs + _specs(1, self.g, 0)
                 + _specs(self.f, self.g, 0) + _specs(1, self.g, 0))
        args += [bits_p, rem_p, inv_p]
        return _call_noflag(self._kernel, self.f, self.g, specs,
                            tuple(args))
