"""3D simplex noise with fBm / ridged-fBm — vectorized JAX re-design.

The reference evaluates scalar simplex noise per cell inside JS loops
(reference ``js/simplex-noise.js:17-53``). Here the same permutation-table
construction (Fisher-Yates over 256 entries driven by the Park-Miller RNG,
``js/simplex-noise.js:8-14``) seeds a table-compatible, fully vectorized
evaluator: one call produces noise for an entire [N] field, and fBm octaves
are unrolled so XLA fuses the whole stack into a handful of VPU passes.

Branchy corner selection is re-expressed as nested ``jnp.where`` so the
kernel is data-parallel. float32 throughout (TPU-native); values match the
reference's float64 within ~1e-5 away from simplex-cell boundaries.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .rng import ParkMiller

# 12 gradient directions (js/simplex-noise.js:7)
_GRAD = np.array(
    [[1, 1, 0], [-1, 1, 0], [1, -1, 0], [-1, -1, 0],
     [1, 0, 1], [-1, 0, 1], [1, 0, -1], [-1, 0, -1],
     [0, 1, 1], [0, -1, 1], [0, 1, -1], [0, -1, -1]],
    dtype=np.float32,
)

# host-side (numpy) constants: embedding a jax.Array constant in a jaxpr
# forces a device->host fetch at MLIR lowering time (~76 s per array over
# the tunneled backend); numpy constants lower as host literals for free
_GRAD_J = _GRAD
# integer gradient components for the one-hot select path (values ∈ {-1,0,1})
_GRAD_XI = _GRAD[:, 0].astype(np.int32)
_GRAD_YI = _GRAD[:, 1].astype(np.int32)
_GRAD_ZI = _GRAD[:, 2].astype(np.int32)

_F3 = 1.0 / 3.0
_G3 = 1.0 / 6.0


def make_perm_tables(seed: float) -> tuple[np.ndarray, np.ndarray]:
    """Build the 512-entry permutation tables exactly like the reference
    (Fisher-Yates shuffle driven by Park-Miller, js/simplex-noise.js:8-14)."""
    rng = ParkMiller(seed)
    p = np.arange(256, dtype=np.int64)
    for i in range(255, 0, -1):
        j = int(rng() * (i + 1))
        p[i], p[j] = p[j], p[i]
    perm = np.empty(512, dtype=np.int32)
    perm[:256] = p
    perm[256:] = p
    pm12 = (perm % 12).astype(np.int32)
    return perm, pm12


class Tables(NamedTuple):
    """Seed-dependent permutation tables — passed as jit ARGUMENTS (never
    closed over) so kernels don't re-trace per seed."""

    perm: jax.Array   # [512] i32
    pm12: jax.Array   # [512] i32


def tables(seed: float) -> Tables:
    perm, pm12 = make_perm_tables(seed)
    return Tables(jnp.asarray(perm), jnp.asarray(pm12))


def noise3(t: Tables, x, y, z):
    return _noise3(t.perm, t.pm12, _GRAD_J, x, y, z)


def fbm(t: Tables, x, y, z, octaves: int = 5, persistence: float = 2.0 / 3.0):
    """Power-of-two lacunarity fBm (js/simplex-noise.js:34-38)."""
    total = 0.0
    norm = 0.0
    amp = 1.0
    for o in range(octaves):
        f = float(1 << o)
        total = total + amp * noise3(t, x * f, y * f, z * f)
        norm += amp
        amp *= persistence
    return total / norm


def ridged_fbm(t: Tables, x, y, z, octaves: int = 6, lacunarity: float = 2.0,
               gain: float = 0.5, offset: float = 1.0):
    """Ridged multifractal with previous-term feedback
    (js/simplex-noise.js:40-53)."""
    total = 0.0
    freq = 1.0
    amp = 1.0
    prev = 1.0
    norm = 0.0
    for _ in range(octaves):
        n = noise3(t, x * freq, y * freq, z * freq)
        n = offset - jnp.abs(n)
        n = n * n
        total = total + n * amp * prev
        norm += amp
        prev = jnp.minimum(n, 1.0)
        freq *= lacunarity
        amp *= gain
    return total / norm


class SimplexNoise:
    """Seeded, vectorized simplex noise field evaluator (object wrapper
    around the functional API above).

    All methods take jnp arrays of identical shape and return the same shape.
    Octave counts are static Python ints (unrolled under jit).
    """

    def __init__(self, seed: float):
        self.tables = tables(seed)
        self.perm = self.tables.perm
        self.pm12 = self.tables.pm12
        self.grad = _GRAD_J

    def noise3(self, x, y, z):
        return noise3(self.tables, x, y, z)

    def fbm(self, x, y, z, octaves: int = 5, persistence: float = 2.0 / 3.0):
        return fbm(self.tables, x, y, z, octaves, persistence)

    def ridged_fbm(self, x, y, z, octaves: int = 6, lacunarity: float = 2.0,
                   gain: float = 0.5, offset: float = 1.0):
        return ridged_fbm(self.tables, x, y, z, octaves, lacunarity, gain, offset)


def noise3_np(perm: np.ndarray, pm12: np.ndarray, x, y, z):
    """Host (numpy) mirror of :func:`_noise3` for prologue-side scalar/point
    evaluations (hotspot placement, host point projection) — keeps the
    device pipeline free of tiny round-trip noise reads. Same tables, same
    branch logic (reference js/simplex-noise.js:17-33); float64 here vs
    float32 on device differs only at ~1e-7."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64)
    s = (x + y + z) * _F3
    i = np.floor(x + s)
    j = np.floor(y + s)
    k = np.floor(z + s)
    t = (i + j + k) * _G3
    x0 = x - i + t
    y0 = y - j + t
    z0 = z - k + t

    cxy = x0 >= y0
    cyz = y0 >= z0
    cxz = x0 >= z0
    one = np.ones_like(x, np.int64)
    zero = np.zeros_like(x, np.int64)
    i1 = np.where(cxy & (cyz | cxz), one, zero)
    j1 = np.where(~cxy & cyz, one, zero)
    k1 = np.where((cxy & ~cyz & ~cxz) | (~cxy & ~cyz), one, zero)
    i2 = np.where(cxy | (~cxy & cyz & cxz), one, zero)
    j2 = np.where(cxy & cyz, one, np.where(~cxy, one, zero))
    k2 = np.where(cxy & ~cyz, one, np.where(~cxy & (~cyz | ~cxz), one, zero))

    ii = i.astype(np.int64) & 255
    jj = j.astype(np.int64) & 255
    kk = k.astype(np.int64) & 255

    def contrib(di, dj, dk, xo, yo, zo):
        h = pm12[ii + di + perm[jj + dj + perm[kk + dk]]]
        g = _GRAD[h]
        tt = np.maximum(0.6 - xo * xo - yo * yo - zo * zo, 0.0)
        t2 = tt * tt
        return t2 * t2 * (g[..., 0] * xo + g[..., 1] * yo + g[..., 2] * zo)

    n0 = contrib(0, 0, 0, x0, y0, z0)
    n1 = contrib(i1, j1, k1, x0 - i1 + _G3, y0 - j1 + _G3, z0 - k1 + _G3)
    n2 = contrib(i2, j2, k2, x0 - i2 + 2 * _G3, y0 - j2 + 2 * _G3,
                 z0 - k2 + 2 * _G3)
    n3 = contrib(1, 1, 1, x0 - 1 + 3 * _G3, y0 - 1 + 3 * _G3, z0 - 1 + 3 * _G3)
    return 32.0 * (n0 + n1 + n2 + n3)


def _lut(table, idx, width: int):
    """Small-table lookup as a fused compare-select reduction.

    TPU gathers are index-processing bound even for a 512-entry table
    (~9 ms per [1M] lookup); the one-hot select fuses into a VPU loop with
    no memory indirection. Measured on v5e @1M: fbm5 564 ms (gather) →
    127 ms (this), bit-identical. ``width`` bounds the index range
    (kk+dk ≤ 256 needs only the first 257 entries)."""
    t = jnp.arange(width, dtype=jnp.int32)
    shape = idx.shape
    flat = idx.reshape(-1)
    out = jnp.sum(
        jnp.where(flat[:, None] == t[None, :], table[None, :width], 0),
        axis=1)
    return out.reshape(shape)


def _grad_components(h):
    """Gradient components for hash ``h`` ∈ [0,12) via bit arithmetic on
    the structured table (_GRAD rows: x = ±1 for h<8 alternating by bit 0;
    y = ±1 for h<4 by bit 1 and h≥8 by bit 0; z = ±1 for 4≤h<12 by bit 1)
    — replaces three 12-wide one-hot selects with a few integer ops,
    value-identical (±1.0/0.0 exactly)."""
    b0 = (h & 1).astype(jnp.float32)
    b1 = ((h >> 1) & 1).astype(jnp.float32)
    sign0 = 1.0 - 2.0 * b0
    sign1 = 1.0 - 2.0 * b1
    gx = jnp.where(h < 8, sign0, 0.0)
    gy = jnp.where(h < 4, sign1, jnp.where(h >= 8, sign0, 0.0))
    gz = jnp.where(h >= 4, sign1, 0.0)
    return gx, gy, gz


def _corner_contrib(perm, pm12, inner, ii, jj, xo, yo, zo):
    """Attenuated gradient dot for one simplex corner. The permutation
    lookups ride one-hot selects (see :func:`_lut`); ``inner`` is the
    already-computed innermost lookup ``perm[(kk + dk) & 255]`` — the
    corner k-offsets are all 0/1, so callers compute TWO inner luts and
    select per corner instead of four (−17% of the 256-wide select work).

    The 512-entry tables are 256-periodic by construction
    (``perm[x] = perm[x & 255]``, js/simplex-noise.js:12-14), so masking
    the index to the low byte halves every one-hot width — bit-identical,
    ~1.9× less select work."""
    mid = _lut(perm, (jj + inner) & 255, 256)
    h = _lut(pm12, (ii + mid) & 255, 256)
    gx, gy, gz = _grad_components(h)
    t = 0.6 - xo * xo - yo * yo - zo * zo
    t = jnp.maximum(t, 0.0)
    t2 = t * t
    dot = gx * xo + gy * yo + gz * zo
    return t2 * t2 * dot


@jax.jit
def _noise3(perm, pm12, grad, x, y, z):
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    z = jnp.asarray(z, jnp.float32)

    s = (x + y + z) * _F3
    i = jnp.floor(x + s)
    j = jnp.floor(y + s)
    k = jnp.floor(z + s)
    t = (i + j + k) * _G3
    x0 = x - i + t
    y0 = y - j + t
    z0 = z - k + t

    # Simplex corner ordering (js/simplex-noise.js:22-23), branch-free.
    cxy = x0 >= y0
    cyz = y0 >= z0
    cxz = x0 >= z0
    one = jnp.ones_like(x, jnp.int32)
    zero = jnp.zeros_like(x, jnp.int32)

    def sel(c, a, b):
        return jnp.where(c, a, b)

    # branch truth table over (cxy, cyz, cxz)
    i1 = sel(cxy & (cyz | cxz), one, zero)
    j1 = sel(~cxy & cyz, one, zero)
    k1 = sel((cxy & ~cyz & ~cxz) | (~cxy & ~cyz), one, zero)

    i2 = sel(cxy | (~cxy & cyz & cxz), one, zero)
    j2 = sel(cxy & cyz, one, sel(~cxy, one, zero))
    k2 = sel(cxy & ~cyz, one, sel(~cxy & (~cyz | ~cxz), one, zero))

    f1 = i1.astype(jnp.float32)
    g1 = j1.astype(jnp.float32)
    h1 = k1.astype(jnp.float32)
    f2 = i2.astype(jnp.float32)
    g2 = j2.astype(jnp.float32)
    h2 = k2.astype(jnp.float32)

    x1 = x0 - f1 + _G3
    y1 = y0 - g1 + _G3
    z1 = z0 - h1 + _G3
    x2 = x0 - f2 + 2 * _G3
    y2 = y0 - g2 + 2 * _G3
    z2 = z0 - h2 + 2 * _G3
    x3 = x0 - 1 + 3 * _G3
    y3 = y0 - 1 + 3 * _G3
    z3 = z0 - 1 + 3 * _G3

    ii = i.astype(jnp.int32) & 255
    jj = j.astype(jnp.int32) & 255
    kk = k.astype(jnp.int32) & 255

    # the corner k-offsets are all 0/1 → only two distinct inner lookups
    inner_a = _lut(perm, kk, 256)               # kk already masked
    inner_b = _lut(perm, (kk + 1) & 255, 256)
    inner_1 = jnp.where(k1 > 0, inner_b, inner_a)
    inner_2 = jnp.where(k2 > 0, inner_b, inner_a)

    n0 = _corner_contrib(perm, pm12, inner_a, ii, jj, x0, y0, z0)
    n1 = _corner_contrib(perm, pm12, inner_1, ii + i1, jj + j1, x1, y1, z1)
    n2 = _corner_contrib(perm, pm12, inner_2, ii + i2, jj + j2, x2, y2, z2)
    n3 = _corner_contrib(perm, pm12, inner_b, ii + 1, jj + 1, x3, y3, z3)

    return 32.0 * (n0 + n1 + n2 + n3)
