"""Microbenchmark: arbitrary-index [N,K] gather sweeps vs banded roll sweeps.

The Fibonacci spiral ordering concentrates neighbor index offsets (j - i)
onto ~16-32 signed Fibonacci numbers (measured: top-32 offsets cover 99.5%+
of edges at 204K cells, jitter 0.75). If masked jnp.roll shifts beat the
index-bound gather, every BFS/advection/smoothing sweep in the pipeline can
switch to the banded form. Run on the TPU:  python tools/microbench_banded.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from planet_heightmap_generation_tpu.mesh import build_sphere


def build_banded(g, n_bands):
    """Top-``n_bands`` offsets + remainder edge list (padded)."""
    ni, nm = np.asarray(g.nbr_idx), np.asarray(g.nbr_mask)
    npad = ni.shape[0]
    i = np.arange(npad)[:, None]
    off_all = ni - i
    offs, counts = np.unique(off_all[nm], return_counts=True)
    order = np.argsort(-counts)
    band_off = offs[order][:n_bands]
    covered = counts[order][:n_bands].sum() / counts.sum()

    band_mask = np.zeros((npad, len(band_off)), bool)
    in_band = np.zeros_like(nm)
    for d, o in enumerate(band_off):
        hit = nm & (off_all == o)
        dst = i[:, 0] + o
        ok = hit.any(axis=1) & (dst >= 0) & (dst < npad)
        band_mask[:, d] = ok
        in_band |= hit
    rem = nm & ~in_band
    rem_src, rem_k = np.nonzero(rem)
    rem_dst = ni[rem_src, rem_k]
    return (tuple(int(o) for o in band_off), jnp.asarray(band_mask),
            jnp.asarray(rem_src.astype(np.int32)),
            jnp.asarray(rem_dst.astype(np.int32)), covered,
            len(rem_src))


@partial(jax.jit, static_argnames=("sweeps",))
def gather_sweep(dist, nbr_idx, nbr_mask, sweeps: int):
    def body(_, dist):
        nd = jnp.where(nbr_mask[:, :, None], dist[nbr_idx], jnp.inf)
        return jnp.minimum(dist, jnp.min(nd, axis=1) + 1.0)
    return jax.lax.fori_loop(0, sweeps, body, dist)


@partial(jax.jit, static_argnames=("band_off", "sweeps"))
def banded_sweep(dist, band_off, band_mask, rem_src, rem_dst, sweeps: int):
    def body(_, dist):
        best = jnp.full_like(dist, jnp.inf)
        for d, off in enumerate(band_off):
            nd = jnp.roll(dist, -off, axis=0)
            best = jnp.minimum(best, jnp.where(band_mask[:, d:d + 1], nd,
                                               jnp.inf))
        if rem_src.shape[0]:
            best = best.at[rem_src].min(dist[rem_dst])
        return jnp.minimum(dist, best + 1.0)
    return jax.lax.fori_loop(0, sweeps, body, dist)


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0, out


def main():
    sweeps = 50
    for n in (204_000, 1_000_000):
        g = build_sphere(n, 0.75, seed=42.0)
        gd_idx, gd_mask = jnp.asarray(g.nbr_idx), jnp.asarray(g.nbr_mask)
        npad = g.nbr_idx.shape[0]
        for f in (1, 5):
            seeds = np.zeros((npad, f), np.float32)
            seeds[:] = np.inf
            rng = np.random.default_rng(0)
            seeds[rng.integers(0, npad, 50), :] = 0.0
            dist0 = jnp.asarray(seeds)

            t, ref = timed(gather_sweep, dist0, gd_idx, gd_mask, sweeps)
            print(f"N={n} F={f}: gather K={g.nbr_idx.shape[1]}  "
                  f"{t / sweeps * 1e3:.3f} ms/sweep")
            for nb in (16, 24, 32, 48):
                boff, bmask, rsrc, rdst, cov, m = build_banded(g, nb)
                t, out = timed(banded_sweep, dist0, boff, bmask, rsrc, rdst,
                               sweeps)
                # equivalence only when coverage is total
                eq = bool(jnp.all((out == ref) | ~jnp.isfinite(ref)).item()) \
                    if m == 0 or cov == 1.0 else None
                print(f"  banded D={nb} cov={cov:.4f} rem={m}:  "
                      f"{t / sweeps * 1e3:.3f} ms/sweep  "
                      f"max|Δ|={float(jnp.nanmax(jnp.where(jnp.isfinite(ref), jnp.abs(out - ref), 0))):.1f}")


if __name__ == "__main__":
    main()
