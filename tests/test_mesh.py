"""Mesh builder tests: Fibonacci geometry, watertight closure, adjacency
structure invariants (SURVEY.md §2.2 TPU note: fixed-degree padded arrays)."""

import numpy as np
import pytest

from planet_heightmap_generation_tpu.mesh import build_sphere, generate_fibonacci_sphere
from planet_heightmap_generation_tpu.ops.rng import ParkMiller


def test_fibonacci_points_on_unit_sphere():
    rng = ParkMiller(1)
    xyz = generate_fibonacci_sphere(5000, 0.75, rng)
    np.testing.assert_allclose(np.linalg.norm(xyz, axis=1), 1.0, atol=1e-12)


def test_fibonacci_no_jitter_consumes_no_rng():
    a = ParkMiller(1)
    generate_fibonacci_sphere(100, 0.0, a)
    b = ParkMiller(1)
    assert a() == b()


def test_fibonacci_jitter_consumes_4n_draws():
    a = ParkMiller(1)
    generate_fibonacci_sphere(100, 0.5, a)
    b = ParkMiller(1)
    b.sequence(400)
    assert a() == b()


def test_graph_invariants(tiny_sphere):
    g = tiny_sphere
    assert g.n_cells == 2001
    assert g.n_padded % 1024 == 0
    # symmetric adjacency
    n, k = g.nbr_idx.shape
    for r in [0, 1, 500, 1000, g.pole_id]:
        for j in range(k):
            if not g.nbr_mask[r, j]:
                continue
            nb = g.nbr_idx[r, j]
            back = g.nbr_idx[nb][g.nbr_mask[nb]]
            assert r in back, f"edge {r}->{nb} not symmetric"
    # every real cell has >= 3 neighbors (watertight sphere)
    assert (g.deg[: g.n_cells] >= 3).all()
    # padding inert
    assert not g.nbr_mask[g.n_cells :].any()
    assert not g.valid[g.n_cells :].any()
    assert g.valid[: g.n_cells].all()


def test_degrees_are_fibonacci_like(tiny_sphere):
    g = tiny_sphere
    deg = g.deg[: g.n_cells]
    # spiral interior cells are mostly degree 6
    assert np.median(deg) == 6
    assert deg.max() <= 16


def test_euler_characteristic(tiny_sphere):
    """V - E + F = 2 for a watertight sphere triangulation. Edges counted
    from the triangulation; the K_FIXED adjacency is a symmetric subgraph
    covering all but the rare over-degree cells' longest edges."""
    g = tiny_sphere
    v = g.n_cells
    tri_edges = set()
    for a, b, c in g.triangles:
        for x, y in ((a, b), (b, c), (c, a)):
            tri_edges.add((min(x, y), max(x, y)))
    f = len(g.triangles)
    assert v - len(tri_edges) + f == 2
    # adjacency ⊆ triangulation edges, ≥98% coverage
    adj = int(g.nbr_mask.sum()) // 2
    assert adj <= len(tri_edges)
    assert adj >= 0.98 * len(tri_edges)


def test_neighbor_dist_positive(tiny_sphere):
    g = tiny_sphere
    d = g.nbr_dist[g.nbr_mask]
    assert (d > 0).all()
    # chord distance bounded by cell spacing scale (~sqrt(4pi/N))
    assert d.mean() < 5 * np.sqrt(4 * np.pi / g.n_cells)


def test_determinism():
    a = build_sphere(1500, 0.75, seed=7.0)
    b = build_sphere(1500, 0.75, seed=7.0)
    np.testing.assert_array_equal(a.pos, b.pos)
    np.testing.assert_array_equal(a.nbr_idx, b.nbr_idx)


def test_avg_edge_scales():
    a = build_sphere(1000, 0.5, seed=1.0)
    b = build_sphere(4000, 0.5, seed=1.0)
    assert a.avg_edge > b.avg_edge * 1.7  # ~2x for 4x cells


def test_adjacency_symmetric():
    """K_FIXED truncation must drop edges in BOTH directions: asymmetric
    adjacency creates mass in proportional-share transport (advisor r1)."""
    for n, seed in ((2000, 3.0), (5000, 11.0)):
        g = build_sphere(n, 0.75, seed=seed)
        edges = set()
        for v in range(g.n_cells):
            for k in range(g.k_max):
                if g.nbr_mask[v, k]:
                    edges.add((v, int(g.nbr_idx[v, k])))
        for a, b in edges:
            assert (b, a) in edges, f"edge {a}->{b} has no reverse"


def test_native_packed_matches_host_banded():
    """build_banded_packed (native C++) vs build_banded (pure numpy) and
    the raw SphereGraph arrays — independent implementations of the same
    packing, compared field by field. Guards the silent-corruption mode
    where a packing bug distorts expected AND actual in the downstream
    edge-set parity tests (both derive from the packed form via to_device;
    ADVICE r4 #2). Skips LOUDLY when the native library is absent — the
    packed path is then untested on this host."""
    from planet_heightmap_generation_tpu.mesh.build import (
        build_sphere, build_banded, build_banded_packed)

    g = build_sphere(4000, 0.75, seed=11.0)
    packed = build_banded_packed(g.nbr_idx, g.nbr_mask)
    if packed is None:
        pytest.skip("NATIVE mesh_build LIBRARY UNAVAILABLE — "
                    "build_banded_packed parity NOT verified on this host")
    band_off, band_bits, mask_bits, off16, exc_f, exc_v, rem_src, \
        rem_dst = packed
    boff_ref, bmask_ref, rsrc_ref, rdst_ref = build_banded(
        g.nbr_idx, g.nbr_mask)

    assert tuple(band_off) == tuple(int(o) for o in boff_ref)
    d = len(band_off)
    got_bmask = ((band_bits[:, None] >> np.arange(d, dtype=np.uint32))
                 & 1) > 0
    np.testing.assert_array_equal(got_bmask, bmask_ref)

    k = g.nbr_idx.shape[1]
    got_nmask = ((mask_bits[:, None] >> np.arange(k, dtype=np.uint32))
                 & 1) > 0
    np.testing.assert_array_equal(got_nmask, g.nbr_mask)

    # contract: identical remainder edge order + bucketing (docstring)
    np.testing.assert_array_equal(rem_src, rsrc_ref)
    np.testing.assert_array_equal(rem_dst, rdst_ref)

    # off16 + exception scatter reconstruct nbr_idx exactly
    idx = (np.arange(g.n_padded, dtype=np.int64)[:, None]
           + off16.astype(np.int64)).reshape(-1)
    idx[exc_f] = exc_v
    np.testing.assert_array_equal(idx.reshape(g.n_padded, k), g.nbr_idx)


def test_to_device_matches_host_arrays():
    """DeviceGraph arrays reconstructed on device from the packed upload
    must equal the host SphereGraph truth (nbr_idx/nbr_mask/nbr_dist/
    band_mask) whichever packing path produced them."""
    from planet_heightmap_generation_tpu.mesh.build import (
        build_sphere, build_banded)
    from planet_heightmap_generation_tpu.mesh.device import to_device

    g = build_sphere(4000, 0.75, seed=11.0)
    dg = to_device(g)
    np.testing.assert_array_equal(np.asarray(dg.nbr_idx), g.nbr_idx)
    np.testing.assert_array_equal(np.asarray(dg.nbr_mask), g.nbr_mask)
    # device recomputes nbr_dist from f32 positions
    np.testing.assert_allclose(np.asarray(dg.nbr_dist), g.nbr_dist,
                               atol=1e-6)
    _, bmask_ref, _, _ = build_banded(g.nbr_idx, g.nbr_mask)
    np.testing.assert_array_equal(np.asarray(dg.band_mask), bmask_ref)
