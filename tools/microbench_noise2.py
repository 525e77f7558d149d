"""Microbenchmark round 2: cheaper bit-exact permutation lookups.

The production one-hot select (`ops.noise._lut`) does ~1300 compare/select/
add VPU ops per corner. Candidates here keep the SAME integer results
(bit-exact downstream float math) while moving work to the MXU:

  A   current production fbm5 (one-hot 512/257-wide selects)
  E16 two-level split: idx&255 -> (hi,lo) 16x16; lo-onehot [N,16] bf16
      @ T[lo,hi] bf16 -> [N,16]; then 16-wide hi-select. All table values
      are small ints (<=255) so bf16 matmul is exact.
  E32 32x8 split (32-wide lo matmul, 8-wide hi select)
  S   octave-stacked fbm: one noise3 eval on [O*N] concatenated coords
      (same ops, 5x fewer HLO instructions)
  SE  stacked + two-level

Run on the TPU: python tools/microbench_noise2.py [N]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from planet_heightmap_generation_tpu.ops.noise import (
    make_perm_tables, Tables, fbm, _GRAD)


def timed(fn, *args, reps=5):
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


# ---- two-level lookup ----------------------------------------------------

def lut2(table256, idx, lo_bits: int):
    """table256[idx & 255] via (lo one-hot bf16 matmul) + hi select.
    table256: [256] i32 values <= 255. Exact."""
    lo_w = 1 << lo_bits
    hi_w = 256 // lo_w
    t2d = table256.reshape(hi_w, lo_w).T.astype(jnp.bfloat16)   # [lo, hi]
    i8 = idx & 255
    lo = i8 & (lo_w - 1)
    hi = i8 >> lo_bits
    oh_lo = (lo[:, None] == jnp.arange(lo_w, dtype=jnp.int32)[None, :]
             ).astype(jnp.bfloat16)
    rows = jnp.dot(oh_lo, t2d, preferred_element_type=jnp.float32)  # [N, hi]
    hsel = hi[:, None] == jnp.arange(hi_w, dtype=jnp.int32)[None, :]
    return jnp.sum(jnp.where(hsel, rows, 0.0), axis=1).astype(jnp.int32)


def make_noise3_2l(lo_bits: int):
    def noise3_2l(perm, pm12, x, y, z):
        perm256 = perm[:256]
        pm256 = pm12[:256]
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

        gxt = jnp.asarray(_GRAD[:, 0])
        gyt = jnp.asarray(_GRAD[:, 1])
        gzt = jnp.asarray(_GRAD[:, 2])

        def contrib(di, dj, dk, xo, yo, zo):
            inner = lut2(perm256, kk + dk, lo_bits)
            mid = lut2(perm256, jj + dj + inner, lo_bits)
            h = lut2(pm256, ii + di + mid, lo_bits)
            hsel = h[:, None] == jnp.arange(12, dtype=jnp.int32)[None, :]
            gx = jnp.sum(jnp.where(hsel, gxt[None, :], 0.0), axis=1)
            gy = jnp.sum(jnp.where(hsel, gyt[None, :], 0.0), axis=1)
            gz = jnp.sum(jnp.where(hsel, gzt[None, :], 0.0), axis=1)
            tt = jnp.maximum(0.6 - xo * xo - yo * yo - zo * zo, 0.0)
            t2_ = tt * tt
            return t2_ * t2_ * (gx * xo + gy * yo + gz * zo)

        n0 = contrib(zero, zero, zero, x0, y0, z0)
        n1 = contrib(i1, j1, k1, x0 - i1 + G3, y0 - j1 + G3, z0 - k1 + G3)
        n2 = contrib(i2, j2, k2, x0 - i2 + 2 * G3, y0 - j2 + 2 * G3,
                     z0 - k2 + 2 * G3)
        n3 = contrib(one, one, one, x0 - 1 + 3 * G3, y0 - 1 + 3 * G3,
                     z0 - 1 + 3 * G3)
        return 32.0 * (n0 + n1 + n2 + n3)
    return noise3_2l


def make_fbm_2l(lo_bits: int, stacked: bool):
    noise3_2l = make_noise3_2l(lo_bits)

    @partial(jax.jit, static_argnames=("octaves",))
    def fbm_2l(perm, pm12, x, y, z, octaves: int = 5):
        if stacked:
            fs = jnp.repeat(
                jnp.asarray([float(1 << o) for o in range(octaves)],
                            jnp.float32), x.shape[0])
            xs = jnp.tile(x, octaves) * fs
            ys = jnp.tile(y, octaves) * fs
            zs = jnp.tile(z, octaves) * fs
            nv = noise3_2l(perm, pm12, xs, ys, zs).reshape(octaves, -1)
            amps = jnp.asarray([(2.0 / 3.0) ** o for o in range(octaves)],
                               jnp.float32)
            return jnp.einsum("o,on->n", amps, nv) / jnp.sum(amps)
        total, norm, amp = 0.0, 0.0, 1.0
        for o in range(octaves):
            f = float(1 << o)
            total = total + amp * noise3_2l(perm, pm12, x * f, y * f, z * f)
            norm += amp
            amp *= 2.0 / 3.0
        return total / norm
    return fbm_2l


@partial(jax.jit, static_argnames=("octaves",))
def fbm_stacked_current(perm, pm12, x, y, z, octaves: int = 5):
    """A's lookup, but one noise3 eval on [O*N] stacked coords."""
    from planet_heightmap_generation_tpu.ops.noise import _noise3, _GRAD_J
    n = x.shape[0]
    fs = jnp.repeat(jnp.asarray([float(1 << o) for o in range(octaves)],
                                jnp.float32), n)
    nv = _noise3(perm, pm12, _GRAD_J, jnp.tile(x, octaves) * fs,
                 jnp.tile(y, octaves) * fs,
                 jnp.tile(z, octaves) * fs).reshape(octaves, n)
    amps = jnp.asarray([(2.0 / 3.0) ** o for o in range(octaves)],
                       jnp.float32)
    return jnp.einsum("o,on->n", amps, nv) / jnp.sum(amps)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
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
    print(f"A   current fbm5 @{n}: {t*1e3:.2f} ms", flush=True)

    t, out = timed(fbm_stacked_current, perm, pm12, x, y, z)
    err = float(jnp.nanmax(jnp.abs(out - ref)))
    print(f"S   stacked fbm5: {t*1e3:.2f} ms  max|err|={err:.2e}", flush=True)

    for lo_bits, name in ((4, "E16 16x16"), (5, "E32 32x8")):
        fn = make_fbm_2l(lo_bits, stacked=False)
        t, out = timed(fn, perm, pm12, x, y, z)
        err = float(jnp.nanmax(jnp.abs(out - ref)))
        print(f"{name} fbm5: {t*1e3:.2f} ms  max|err|={err:.2e}", flush=True)

    fn = make_fbm_2l(4, stacked=True)
    t, out = timed(fn, perm, pm12, x, y, z)
    err = float(jnp.nanmax(jnp.abs(out - ref)))
    print(f"SE  stacked+2l fbm5: {t*1e3:.2f} ms  max|err|={err:.2e}",
          flush=True)


if __name__ == "__main__":
    main()
