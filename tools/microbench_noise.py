"""Microbenchmark: simplex-noise permutation-lookup strategies on TPU.

_noise3 does 3 chained 512-entry table gathers per corner (x4 corners) per
eval, and a planet evaluates dozens of fbm stacks. Candidates:

  A. current: pm12[ii+di + perm[jj+dj + perm[kk+dk]]]   (12 gathers)
  B. composed 2-level [512,512] table: pm12[ii+di + T2[jj+dj, kk+dk]]
     (8 gathers, 1MB table per seed)
  C. fully composed [257,257,257] i8 table (4 gathers, ~17MB per seed)
  D. one-hot matmul on the MXU for the innermost lookup

Run: python tools/microbench_noise.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from planet_heightmap_generation_tpu.ops.noise import (
    make_perm_tables, Tables, fbm, _GRAD)


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


@partial(jax.jit, static_argnames=("octaves",))
def fbm_current(perm, pm12, x, y, z, octaves: int = 5):
    return fbm(Tables(perm, pm12), x, y, z, octaves)


def main():
    n = 1_000_000
    rng = np.random.default_rng(0)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    x = jnp.asarray(v[:, 0] * 4, jnp.float32)
    y = jnp.asarray(v[:, 1] * 4, jnp.float32)
    z = jnp.asarray(v[:, 2] * 4, jnp.float32)
    perm_np, pm12_np = make_perm_tables(7.0)
    perm = jnp.asarray(perm_np)
    pm12 = jnp.asarray(pm12_np)

    t, ref = timed(fbm_current, perm, pm12, x, y, z)
    print(f"A current fbm5 @1M: {t*1e3:.2f} ms")

    # B: composed 2-level table T2[b, c] = perm[b + perm[c]], b = jj+dj and
    # c = kk+dk are both <= 256, and b + perm[c] <= 511 stays in the
    # doubled 512-entry perm
    b = np.arange(257)
    c = np.arange(257)
    t2_np = perm_np[b[:, None] + perm_np[c][None, :]]
    t2 = jnp.asarray(t2_np.astype(np.int32))

    @jax.jit
    def noise3_t2(t2, pm12, x, y, z):
        # replicate _noise3 with the composed table (single corner shown x4)
        from planet_heightmap_generation_tpu.ops.noise import _GRAD_J
        F3, G3 = 1.0 / 3.0, 1.0 / 6.0
        s = (x + y + z) * F3
        i = jnp.floor(x + s); j = jnp.floor(y + s); k = jnp.floor(z + s)
        t = (i + j + k) * G3
        x0 = x - i + t; y0 = y - j + t; z0 = z - k + t
        cxy = x0 >= y0; cyz = y0 >= z0; cxz = x0 >= z0
        one = jnp.ones_like(x, jnp.int32); zero = jnp.zeros_like(x, jnp.int32)
        i1 = jnp.where(cxy & (cyz | cxz), one, zero)
        j1 = jnp.where(~cxy & cyz, one, zero)
        k1 = jnp.where((cxy & ~cyz & ~cxz) | (~cxy & ~cyz), one, zero)
        i2 = jnp.where(cxy | (~cxy & cyz & cxz), one, zero)
        j2 = jnp.where(cxy & cyz, one, jnp.where(~cxy, one, zero))
        k2 = jnp.where(cxy & ~cyz, one,
                       jnp.where(~cxy & (~cyz | ~cxz), one, zero))
        ii = i.astype(jnp.int32) & 255
        jj = j.astype(jnp.int32) & 255
        kk = k.astype(jnp.int32) & 255

        def contrib(di, dj, dk, xo, yo, zo):
            mid = t2[(jj + dj), (kk + dk)]
            h = pm12[ii + di + mid]
            g = _GRAD_J[h]
            tt = jnp.maximum(0.6 - xo * xo - yo * yo - zo * zo, 0.0)
            t2_ = tt * tt
            return t2_ * t2_ * (g[:, 0] * xo + g[:, 1] * yo + g[:, 2] * zo)

        n0 = contrib(zero, zero, zero, x0, y0, z0)
        n1 = contrib(i1, j1, k1, x0 - i1 + G3, y0 - j1 + G3, z0 - k1 + G3)
        n2 = contrib(i2, j2, k2, x0 - i2 + 2 * G3, y0 - j2 + 2 * G3,
                     z0 - k2 + 2 * G3)
        n3 = contrib(one, one, one, x0 - 1 + 3 * G3, y0 - 1 + 3 * G3,
                     z0 - 1 + 3 * G3)
        return 32.0 * (n0 + n1 + n2 + n3)

    @partial(jax.jit, static_argnames=("octaves",))
    def fbm_t2(t2, pm12, x, y, z, octaves: int = 5):
        total, norm, amp = 0.0, 0.0, 1.0
        for o in range(octaves):
            f = float(1 << o)
            total = total + amp * noise3_t2(t2, pm12, x * f, y * f, z * f)
            norm += amp
            amp *= 2.0 / 3.0
        return total / norm

    t, out = timed(fbm_t2, t2, pm12, x, y, z)
    err = float(jnp.nanmax(jnp.abs(out - ref)))
    print(f"B composed-T2 fbm5 @1M: {t*1e3:.2f} ms  max|err|={err:.2e}")




def _append_onehot_bench():
    """C: table lookups as fused compare-select reductions (no gather)."""
    n = 1_000_000
    rng = np.random.default_rng(0)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    x = jnp.asarray(v[:, 0] * 4, jnp.float32)
    y = jnp.asarray(v[:, 1] * 4, jnp.float32)
    z = jnp.asarray(v[:, 2] * 4, jnp.float32)
    perm_np, pm12_np = make_perm_tables(7.0)
    perm = jnp.asarray(perm_np)
    pm12 = jnp.asarray(pm12_np)

    def lut(table, idx, width):
        t = jnp.arange(width, dtype=jnp.int32)
        return jnp.sum(
            jnp.where(idx[:, None] == t[None, :], table[None, :], 0), axis=1)

    @jax.jit
    def noise3_oh(perm, pm12, x, y, z):
        from planet_heightmap_generation_tpu.ops.noise import _GRAD_J
        F3, G3 = 1.0 / 3.0, 1.0 / 6.0
        s = (x + y + z) * F3
        i = jnp.floor(x + s); j = jnp.floor(y + s); k = jnp.floor(z + s)
        t = (i + j + k) * G3
        x0 = x - i + t; y0 = y - j + t; z0 = z - k + t
        cxy = x0 >= y0; cyz = y0 >= z0; cxz = x0 >= z0
        one = jnp.ones_like(x, jnp.int32); zero = jnp.zeros_like(x, jnp.int32)
        i1 = jnp.where(cxy & (cyz | cxz), one, zero)
        j1 = jnp.where(~cxy & cyz, one, zero)
        k1 = jnp.where((cxy & ~cyz & ~cxz) | (~cxy & ~cyz), one, zero)
        i2 = jnp.where(cxy | (~cxy & cyz & cxz), one, zero)
        j2 = jnp.where(cxy & cyz, one, jnp.where(~cxy, one, zero))
        k2 = jnp.where(cxy & ~cyz, one,
                       jnp.where(~cxy & (~cyz | ~cxz), one, zero))
        ii = i.astype(jnp.int32) & 255
        jj = j.astype(jnp.int32) & 255
        kk = k.astype(jnp.int32) & 255

        def contrib(di, dj, dk, xo, yo, zo):
            inner = lut(perm, kk + dk, 512)
            mid = lut(perm, jj + dj + inner, 512)
            h = lut(pm12, ii + di + mid, 512)
            g = _GRAD_J[h]
            tt = jnp.maximum(0.6 - xo * xo - yo * yo - zo * zo, 0.0)
            t2_ = tt * tt
            return t2_ * t2_ * (g[:, 0] * xo + g[:, 1] * yo + g[:, 2] * zo)

        n0 = contrib(zero, zero, zero, x0, y0, z0)
        n1 = contrib(i1, j1, k1, x0 - i1 + G3, y0 - j1 + G3, z0 - k1 + G3)
        n2 = contrib(i2, j2, k2, x0 - i2 + 2 * G3, y0 - j2 + 2 * G3,
                     z0 - k2 + 2 * G3)
        n3 = contrib(one, one, one, x0 - 1 + 3 * G3, y0 - 1 + 3 * G3,
                     z0 - 1 + 3 * G3)
        return 32.0 * (n0 + n1 + n2 + n3)

    @partial(jax.jit, static_argnames=("octaves",))
    def fbm_oh(perm, pm12, x, y, z, octaves: int = 5):
        total, norm, amp = 0.0, 0.0, 1.0
        for o in range(octaves):
            f = float(1 << o)
            total = total + amp * noise3_oh(perm, pm12, x * f, y * f, z * f)
            norm += amp
            amp *= 2.0 / 3.0
        return total / norm

    t, ref = timed(fbm_current, perm, pm12, x, y, z)
    t2v, out = timed(fbm_oh, perm, pm12, x, y, z)
    err = float(jnp.nanmax(jnp.abs(out - ref)))
    print(f"C onehot-select fbm5 @1M: {t2v*1e3:.2f} ms  max|err|={err:.2e}"
          f"  (A re-run {t*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
    _append_onehot_bench()
