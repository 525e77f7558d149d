"""Banded (roll-based) neighbor sweeps vs the [N,K] gather forms.

The banded adjacency (mesh/build.py:build_banded) re-expresses the exact
same edge set, so order-independent reductions must be bit-identical and
float sums equal within tolerance, on any mesh/seed/jitter.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from planet_heightmap_generation_tpu.mesh import build_sphere
from planet_heightmap_generation_tpu.mesh.device import to_device
from planet_heightmap_generation_tpu.ops import graph as gops
from planet_heightmap_generation_tpu.ops import banded as bops


@pytest.fixture(scope="module")
def g():
    return to_device(build_sphere(4000, 0.75, seed=11.0))


def _rand(g, shape=(), seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.normal(size=(g.n_padded, *shape)).astype(np.float32))


def test_band_edges_cover_adjacency(g):
    """Band + remainder edges = exactly the nbr_idx/nbr_mask edge set."""
    ni, nm = np.asarray(g.nbr_idx), np.asarray(g.nbr_mask)
    ref = {(i, int(ni[i, k]))
           for i in range(g.n_padded) for k in range(g.k_max) if nm[i, k]}
    got = set()
    bm = np.asarray(g.band_mask)
    for d, off in enumerate(g.band_off):
        for i in np.nonzero(bm[:, d])[0]:
            got.add((int(i), int(i) + off))
    rs, rd = np.asarray(g.rem_src), np.asarray(g.rem_dst)
    real = rs < g.n_padded
    got |= {(int(s), int(t)) for s, t in zip(rs[real], rd[real])}
    assert got == ref


def test_banded_min_max_exact(g):
    f = _rand(g)
    ref_min = gops.masked_min_nbr(f, g.nbr_idx, g.nbr_mask)
    ref_max = gops.masked_max_nbr(f, g.nbr_idx, g.nbr_mask)
    got_min = bops.banded_min(f, g.band_off, g.band_mask, g.rem_src, g.rem_dst)
    got_max = bops.banded_max(f, g.band_off, g.band_mask, g.rem_src, g.rem_dst)
    deg = np.asarray(g.nbr_mask).sum(1)
    has = deg > 0
    assert np.array_equal(np.asarray(got_min)[has], np.asarray(ref_min)[has])
    assert np.array_equal(np.asarray(got_max)[has], np.asarray(ref_max)[has])


def test_banded_sum_count(g):
    f = _rand(g)
    v = f[g.nbr_idx]
    ref = jnp.sum(jnp.where(g.nbr_mask, v, 0.0), axis=1)
    got = bops.banded_sum(f, g.band_off, g.band_mask, g.rem_src, g.rem_dst)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    ref_deg = jnp.sum(g.nbr_mask, axis=1)
    got_deg = bops.banded_count(g.band_mask, g.rem_src)
    assert np.array_equal(np.asarray(got_deg), np.asarray(ref_deg))


def test_bfs_hops_multi_banded_exact(g):
    rng = np.random.default_rng(3)
    n = g.n_padded
    seeds = np.zeros((n, 3), bool)
    seeds[rng.integers(0, g.n_cells, 40), 0] = True
    seeds[rng.integers(0, g.n_cells, 7), 1] = True
    seeds[rng.integers(0, g.n_cells, 200), 2] = True
    barrier = np.zeros((n, 3), bool)
    barrier[rng.integers(0, g.n_cells, 300), 0] = True
    cost = 0.5 + rng.random((n, 3)).astype(np.float32)
    ref = gops.bfs_hops_multi(jnp.asarray(seeds), jnp.asarray(barrier),
                              g.nbr_idx, g.nbr_mask,
                              rand_cost=jnp.asarray(cost))
    got = bops.bfs_hops_multi_banded(
        jnp.asarray(seeds), jnp.asarray(barrier),
        g.band_off, g.band_mask, g.rem_src, g.rem_dst,
        rand_cost=jnp.asarray(cost))
    r, q = np.asarray(ref), np.asarray(got)
    fin = np.isfinite(r)
    assert np.array_equal(np.isfinite(q), fin)
    np.testing.assert_allclose(q[fin], r[fin], rtol=1e-5)


def test_smooth_field_banded(g):
    from planet_heightmap_generation_tpu.climate.util import smooth_field
    f = _rand(g, seed=5)
    ref = smooth_field(f, g.nbr_idx, g.nbr_mask, 4)
    got = bops.smooth_field_banded(f, g.band_off, g.band_mask,
                                   g.rem_src, g.rem_dst, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
    f2 = _rand(g, shape=(2,), seed=6)
    ref2 = smooth_field(f2, g.nbr_idx, g.nbr_mask, 3)
    got2 = bops.smooth_field_banded(f2, g.band_off, g.band_mask,
                                    g.rem_src, g.rem_dst, 3)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=2e-4, atol=2e-5)


def test_smooth_masked_banded(g):
    from planet_heightmap_generation_tpu.climate.util import smooth_masked
    f = _rand(g, seed=7)
    mask = jnp.asarray(np.asarray(g.pos)[:, 2] > 0.1) & g.valid
    ref = smooth_masked(f, mask, g.nbr_idx, g.nbr_mask, 5)
    got = bops.smooth_masked_banded(f, mask, g.band_off, g.band_mask,
                                    g.rem_src, g.rem_dst, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_band_gate_and_nbr_dist(g):
    lab = jnp.asarray((np.asarray(g.pos)[:, 2] > 0).astype(np.int32))
    gate = bops.band_gate(lab, g.band_off, g.band_mask)
    bm = np.asarray(g.band_mask)
    gl = np.asarray(lab)
    for d, off in enumerate(g.band_off):
        exp = bm[:, d] & (np.roll(gl, -off) == gl)
        assert np.array_equal(np.asarray(gate)[:, d], exp)

    bd = bops.band_nbr_dist(g.pos, g.band_off, g.band_mask)
    ref_d = np.asarray(g.nbr_dist)
    ni, nm = np.asarray(g.nbr_idx), np.asarray(g.nbr_mask)
    i = np.arange(g.n_padded)[:, None]
    for d, off in enumerate(g.band_off):
        sel = nm & (ni - i == off)
        rows, ks = np.nonzero(sel)
        np.testing.assert_allclose(np.asarray(bd)[rows, d], ref_d[rows, ks],
                                   rtol=1e-5, atol=1e-6)


def test_propagate_stress_banded(g):
    from planet_heightmap_generation_tpu.elevation.collisions import (
        propagate_stress_multi)
    rng = np.random.default_rng(9)
    n = g.n_padded
    # two layers with plate-like label fields and sparse boundary stress
    lab1 = jnp.asarray((np.asarray(g.pos)[:, 0] * 4).astype(np.int32))
    lab2 = jnp.asarray((np.asarray(g.pos)[:, 1] * 3).astype(np.int32))
    stress = np.zeros((n, 2), np.float32)
    idx = rng.integers(0, g.n_cells, 150)
    stress[idx, 0] = rng.random(150).astype(np.float32)
    stress[idx, 1] = rng.random(150).astype(np.float32)
    sf = rng.random((n, 2)).astype(np.float32)
    ocean = np.zeros((n, 2), bool)
    ocean[rng.integers(0, g.n_cells, 400), 0] = True

    same1 = (lab1[g.nbr_idx] == lab1[:, None]) & g.nbr_mask
    same2 = (lab2[g.nbr_idx] == lab2[:, None]) & g.nbr_mask
    ref_s, ref_f = propagate_stress_multi(
        jnp.asarray(stress), jnp.asarray(sf),
        jnp.stack([same1, same2], 2), jnp.asarray(ocean),
        g.nbr_idx, 0.9, 0.6, 25)

    from planet_heightmap_generation_tpu.ops.banded import (
        band_gate, rem_gate_eq, propagate_stress_banded)
    gate = (band_gate(lab1, g.band_off, g.band_mask),
            band_gate(lab2, g.band_off, g.band_mask))
    rg = jnp.stack([rem_gate_eq(lab1, g.rem_src, g.rem_dst),
                    rem_gate_eq(lab2, g.rem_src, g.rem_dst)], 1)
    got_s, got_f = propagate_stress_banded(
        jnp.asarray(stress), jnp.asarray(sf), gate, rg, jnp.asarray(ocean),
        g.band_off, g.band_mask, g.rem_src, g.rem_dst, 0.9, 0.6, 25)

    # stress values agree exactly wherever keys are untied (max is order-
    # independent); the carried subduct factor may differ only at bit-equal
    # stress ties, which random float stresses make vanishingly rare
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                               rtol=1e-6, atol=1e-7)
    assert (np.asarray(got_f) == np.asarray(ref_f)).mean() > 0.999


def test_band_bfs_banded(g):
    from planet_heightmap_generation_tpu.ops.graph import band_bfs
    from planet_heightmap_generation_tpu.ops.banded import (
        band_bfs_banded, band_gate, rem_gate_eq)
    rng = np.random.default_rng(13)
    n = g.n_padded
    f = 3
    seeds = np.zeros((n, f), bool)
    for k in range(f):
        seeds[rng.integers(0, g.n_cells, 60), k] = True
    carr = rng.random((2, n, f)).astype(np.float32) * seeds[None]
    tie = (rng.random((n, f)).astype(np.float32) * seeds)
    lab = jnp.asarray((np.asarray(g.pos)[:, 0] * 5).astype(np.int32))
    allow = np.ones((n, f), bool)
    allow[np.asarray(g.pos)[:, 2] > 0.9, 1] = False
    caps = jnp.asarray([6, 9, 4], jnp.int32)
    edge_gate = (lab[g.nbr_idx] == lab[:, None]) & g.nbr_mask
    use_gate = jnp.asarray([True, False, True])

    ref_d, ref_t, ref_c = band_bfs(
        jnp.asarray(seeds), jnp.asarray(carr), g.nbr_idx, g.nbr_mask,
        max_hops=9, hops_cap=caps, allow=jnp.asarray(allow),
        edge_gate=edge_gate, use_gate=use_gate, tie=jnp.asarray(tie),
        num_carry=2)

    eq = band_gate(lab, g.band_off, g.band_mask)
    req = rem_gate_eq(lab, g.rem_src, g.rem_dst)
    rgate = jnp.where(use_gate[None, :], req[:, None], True)
    got_d, got_t, got_c = band_bfs_banded(
        jnp.asarray(seeds), jnp.asarray(carr), *g.bands,
        max_hops=9, hops_cap=caps, allow=jnp.asarray(allow),
        gate_mix=(eq, use_gate), rem_gate=rgate, tie=jnp.asarray(tie),
        num_carry=2)

    rd, qd = np.asarray(ref_d), np.asarray(got_d)
    assert np.array_equal(np.isfinite(rd), np.isfinite(qd))
    fin = np.isfinite(rd)
    np.testing.assert_array_equal(rd[fin], qd[fin])
    # ties agree within the float-key packing precision (~1e-6 at these
    # hop counts); carries agree except where bit-equal keys chose
    # different parents — rare on random ties
    assert np.isclose(np.asarray(ref_t), np.asarray(got_t),
                      atol=2e-5).mean() > 0.995
    assert (np.asarray(ref_c) == np.asarray(got_c)).mean() > 0.995


def test_compute_gradients_banded(g):
    from planet_heightmap_generation_tpu.climate.util import (
        compute_gradients, geo_frame)
    from planet_heightmap_generation_tpu.ops.banded import (
        compute_gradients_banded)
    gf = geo_frame(g.pos)
    f2 = _rand(g, shape=(2,), seed=21)
    ref_e, ref_n = compute_gradients(g.pos, f2, gf.east, gf.north,
                                     g.nbr_idx, g.nbr_mask)
    got_e, got_n = compute_gradients_banded(g.pos, f2, gf.east, gf.north,
                                            *g.bands)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(ref_e),
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_n), np.asarray(ref_n),
                               rtol=5e-3, atol=5e-4)
    f1 = _rand(g, seed=22)
    r_e, r_n = compute_gradients(g.pos, f1, gf.east, gf.north,
                                 g.nbr_idx, g.nbr_mask)
    q_e, q_n = compute_gradients_banded(g.pos, f1, gf.east, gf.north,
                                        *g.bands)
    np.testing.assert_allclose(np.asarray(q_e), np.asarray(r_e),
                               rtol=5e-3, atol=5e-4)
