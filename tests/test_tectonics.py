"""Tectonics tests: plate generation invariants, ocean/land budget,
super-plate structure, coarse→hi-res projection (SURVEY.md §2.3)."""

import numpy as np
import pytest

from planet_heightmap_generation_tpu.mesh import build_sphere
from planet_heightmap_generation_tpu.tectonics import (
    generate_plates,
    assign_ocean_land,
    build_super_plates,
    generate_coarse_plates,
    project_coarse_plates,
)
from planet_heightmap_generation_tpu.tectonics.coarse import assign_plate_densities


@pytest.fixture(scope="module")
def small_coarse():
    """A reduced coarse stage (2K cells, 20 plates) for fast tests."""
    return generate_coarse_plates(
        seed=7, num_plates=20, num_continents=3, n_coarse=2000
    )


def test_plates_cover_all_cells(small_coarse):
    g = small_coarse.graph
    rp = small_coarse.r_plate
    assert rp.shape == (g.n_cells,)
    assert (rp >= 0).all()
    assert rp.max() < small_coarse.plates.num_plates


def test_plate_count(small_coarse):
    assert small_coarse.plates.num_plates == 20
    assert len(np.unique(small_coarse.r_plate)) == 20


def test_plates_connected(small_coarse):
    """After reconnection every plate must be a single connected component."""
    from scipy import sparse
    from scipy.sparse import csgraph

    g = small_coarse.graph
    n = g.n_cells
    rp = small_coarse.r_plate
    src = np.repeat(np.arange(n), g.nbr_idx.shape[1])
    dst = g.nbr_idx[:n].ravel()
    ok = g.nbr_mask[:n].ravel() & (rp[src] == rp[dst])
    m = sparse.coo_matrix((np.ones(ok.sum()), (src[ok], dst[ok])), shape=(n, n))
    _, labels = csgraph.connected_components(m, directed=False)
    for pid in range(small_coarse.plates.num_plates):
        cells = labels[rp == pid]
        assert len(np.unique(cells)) == 1, f"plate {pid} disconnected"


def test_euler_poles_unit_norm(small_coarse):
    p = small_coarse.plates
    np.testing.assert_allclose(np.linalg.norm(p.pole, axis=1), 1.0, atol=1e-9)
    assert (np.abs(p.omega) >= 0.5).all() and (np.abs(p.omega) <= 2.0).all()


def test_determinism():
    a = generate_coarse_plates(seed=3, num_plates=12, num_continents=2, n_coarse=1500)
    b = generate_coarse_plates(seed=3, num_plates=12, num_continents=2, n_coarse=1500)
    np.testing.assert_array_equal(a.r_plate, b.r_plate)
    np.testing.assert_array_equal(a.plates.is_ocean, b.plates.is_ocean)
    c = generate_coarse_plates(seed=4, num_plates=12, num_continents=2, n_coarse=1500)
    assert (c.r_plate != a.r_plate).any()


def test_land_fraction_near_target(small_coarse):
    """Land area should approximate landCoverage (0.3 default) within ~12pp
    (reference grows to 0.9*target then absorbs seas up to 1.1*target)."""
    rp = small_coarse.r_plate
    is_ocean = small_coarse.plates.is_ocean
    land_frac = (~is_ocean[rp]).mean()
    assert 0.15 < land_frac < 0.45, land_frac


def test_land_coverage_slider_scales():
    lo = generate_coarse_plates(seed=5, num_plates=16, num_continents=2,
                                n_coarse=1500, land_coverage=0.15)
    hi = generate_coarse_plates(seed=5, num_plates=16, num_continents=2,
                                n_coarse=1500, land_coverage=0.6)
    f_lo = (~lo.plates.is_ocean[lo.r_plate]).mean()
    f_hi = (~hi.plates.is_ocean[hi.r_plate]).mean()
    assert f_hi > f_lo + 0.2


def test_super_plates(small_coarse):
    assign_plate_densities(small_coarse.plates)
    sp = build_super_plates(
        small_coarse.graph, small_coarse.r_plate, small_coarse.plates
    )
    assert sp.num_super >= 2
    assert (sp.plate_to_super >= 0).all()
    assert sp.plate_to_super.max() == sp.num_super - 1
    # same-type grouping: a super plate's constituents share its flag only in
    # majority — but every constituent component was same-type by construction
    for s in range(sp.num_super):
        members = np.flatnonzero(sp.plate_to_super == s)
        types = small_coarse.plates.is_ocean[members]
        assert (types == types[0]).all(), "super plate mixes ocean and land"
    np.testing.assert_allclose(np.linalg.norm(sp.pole, axis=1), 1.0, atol=1e-6)
    assert ((sp.density > 2.0) & (sp.density < 4.0)).all()


def test_densities(small_coarse):
    assign_plate_densities(small_coarse.plates)
    p = small_coarse.plates
    assert ((p.density_ocean >= 3.0) & (p.density_ocean < 3.5)).all()
    assert ((p.density_land >= 2.4) & (p.density_land < 2.9)).all()
    exp = np.where(p.is_ocean, p.density_ocean, p.density_land)
    np.testing.assert_array_equal(p.density, exp)


def test_projection(small_coarse):
    hi = build_sphere(8000, 0.4, seed=7.0)
    rp_hi = np.asarray(project_coarse_plates(hi, small_coarse, seed=7, num_plates=20))
    assert rp_hi.shape == (hi.n_padded,)
    valid = rp_hi[: hi.n_cells]
    assert (valid >= 0).all() and valid.max() < 20
    # all plates present and areas roughly proportional to coarse areas
    coarse_frac = np.bincount(small_coarse.r_plate, minlength=20) / small_coarse.graph.n_cells
    hi_frac = np.bincount(valid, minlength=20) / hi.n_cells
    assert np.abs(coarse_frac - hi_frac).max() < 0.06
    # fractal perturbation: projected map differs from unperturbed nearest
    from planet_heightmap_generation_tpu.mesh.geobins import nearest_cell
    import jax.numpy as jnp
    plain = np.asarray(
        small_coarse.r_plate[
            np.asarray(nearest_cell(
                jnp.asarray(small_coarse.bins.cand_idx),
                jnp.asarray(small_coarse.bins.cand_mask),
                jnp.asarray(small_coarse.bins.points),
                small_coarse.bins.n_lat, small_coarse.bins.n_lon,
                jnp.asarray(hi.pos),
            ))
        ]
    )
    assert (plain[: hi.n_cells] != valid).mean() > 0.02


def test_geobins_nearest_exact(small_coarse):
    """The bin index must return the true nearest cell (covering guarantee)."""
    from planet_heightmap_generation_tpu.mesh.geobins import nearest_cell
    import jax.numpy as jnp
    rs = np.random.RandomState(0)
    q = rs.normal(size=(2000, 3))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    got = np.asarray(nearest_cell(
        jnp.asarray(small_coarse.bins.cand_idx),
        jnp.asarray(small_coarse.bins.cand_mask),
        jnp.asarray(small_coarse.bins.points),
        small_coarse.bins.n_lat, small_coarse.bins.n_lon,
        jnp.asarray(q.astype(np.float32)),
    ))
    pts = small_coarse.bins.points
    brute = np.argmax(q.astype(np.float32) @ pts.T, axis=1)
    assert (got == brute).mean() > 0.999  # ties at f32 precision only


def test_projection_chunked_matches_direct():
    """The lax.map-chunked candidate lookup (>65536 cells) must equal the
    single-shot path — exercises the padding + reshape slicing."""
    import jax.numpy as jnp
    from planet_heightmap_generation_tpu.mesh.build import build_sphere
    from planet_heightmap_generation_tpu.mesh.geobins import nearest_cell
    from planet_heightmap_generation_tpu.tectonics.coarse import (
        generate_coarse_plates, project_coarse_plates)

    graph = build_sphere(70_000, 0.75, seed=3.0)   # n_padded > 65536
    coarse = generate_coarse_plates(3, 12, 2, n_coarse=4000)
    r = np.asarray(project_coarse_plates(graph, coarse, 3, 12))
    assert r.shape[0] == graph.n_padded
    valid = graph.valid
    assert (r[valid] >= 0).all() and (r[valid] < 12).all()
    # direct (unchunked) nearest lookup on a sample of warped-free points
    # sanity: cells at coarse seed positions project to that seed's plate
    pts = coarse.graph.pos[coarse.plates.seeds[:8]]
    ids = np.asarray(nearest_cell(
        jnp.asarray(coarse.bins.cand_idx), jnp.asarray(coarse.bins.cand_mask),
        jnp.asarray(coarse.bins.points), coarse.bins.n_lat, coarse.bins.n_lon,
        jnp.asarray(pts)))
    np.testing.assert_array_equal(ids, coarse.plates.seeds[:8])
