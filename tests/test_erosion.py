"""Erosion stack tests (SURVEY.md §2.5): drainage invariant after
priority-flood, mass behavior of thermal/creep, flow accumulation
correctness on synthetic forests, smoothing/sharpening properties."""

import numpy as np
import jax.numpy as jnp
import pytest

from planet_heightmap_generation_tpu.mesh import build_sphere
from planet_heightmap_generation_tpu.mesh.device import to_device
from planet_heightmap_generation_tpu.ops.noise import SimplexNoise, tables
from planet_heightmap_generation_tpu.erosion.flood import (
    priority_flood_carve, open_ocean_mask, downstream_accumulate,
    monotonic_enforce,
)
from planet_heightmap_generation_tpu.erosion.fluvial import (
    steepest_receivers, flow_accumulation, stream_power_solve,
)
from planet_heightmap_generation_tpu.erosion.thermal import thermal_step
from planet_heightmap_generation_tpu.erosion.smooth import (
    smooth_elevation, sharpen_ridges, apply_soil_creep,
)
from planet_heightmap_generation_tpu.erosion.composite import run_post_processing


@pytest.fixture(scope="module")
def terrain():
    """Synthetic continent on a small sphere: fbm noise + latitude bias."""
    g = build_sphere(3000, 0.5, seed=3.0)
    gd = to_device(g)
    sn = SimplexNoise(3.0)
    pos = g.pos
    e = np.asarray(sn.fbm(pos[:, 0] * 2, pos[:, 1] * 2, pos[:, 2] * 2)) * 0.6
    e += 0.25 * pos[:, 2]  # tilt so there's a big ocean
    e = np.where(g.valid, e, 0.0).astype(np.float32)
    return g, gd, jnp.asarray(e)


def test_open_ocean_is_largest_component(terrain):
    g, gd, e = terrain
    is_ocean = (e <= 0) & gd.valid
    oo = np.asarray(open_ocean_mask(is_ocean, gd.valid, *gd.bands))
    assert oo.sum() > 0
    assert (oo & ~np.asarray(is_ocean)).sum() == 0


def test_flood_drainage_invariant(terrain):
    """After priority-flood every land cell must have a strictly descending
    drain path reaching water (SURVEY.md hard part 1)."""
    g, gd, e = terrain
    is_ocean = (e <= 0) & gd.valid
    out, drain, surface = priority_flood_carve(
        e, is_ocean, gd.valid, *gd.bands, jnp.float32(0.5))
    out = np.asarray(out)
    drain = np.asarray(drain)
    is_ocean_np = np.asarray(is_ocean)
    valid = np.asarray(gd.valid)

    land = (~is_ocean_np) & valid
    # strict descent along drain pointers
    for r in np.flatnonzero(land):
        t = drain[r]
        assert t >= 0
        t_elev = 0.0 if is_ocean_np[t] else out[t]
        assert out[r] > t_elev, f"cell {r} does not descend ({out[r]} <= {t_elev})"
    # every path reaches water (follow pointers)
    reached = is_ocean_np.copy()
    for _ in range(5000):
        new = reached | (land & reached[np.where(drain >= 0, drain, 0)] & (drain >= 0))
        if (new == reached).all():
            break
        reached = new
    assert reached[land].all(), "some land cells do not drain to water"


def test_flood_preserves_ocean(terrain):
    g, gd, e = terrain
    is_ocean = (e <= 0) & gd.valid
    out, _, _ = priority_flood_carve(
        e, is_ocean, gd.valid, *gd.bands, jnp.float32(0.5))
    np.testing.assert_array_equal(
        np.asarray(out)[np.asarray(is_ocean)], np.asarray(e)[np.asarray(is_ocean)])


def test_downstream_accumulate_chain():
    # chain 0→1→2→3→sink, plus isolated 4
    ptr = jnp.asarray(np.array([1, 2, 3, -1, -1], np.int32))
    sink = jnp.asarray(np.array([False, False, False, True, True]))
    vals = jnp.asarray(np.ones(5, np.float32))
    out = np.asarray(downstream_accumulate(vals, ptr, sink, rounds=5))
    # sink cells still RECEIVE flux (they just don't forward it)
    np.testing.assert_allclose(out, [1, 2, 3, 4, 1])


def test_flow_accumulation_tree():
    # two branches joining: 0→2, 1→2, 2→3, 3 is outlet (ocean)
    land = jnp.asarray(np.array([True, True, True, False]))
    rcv = jnp.asarray(np.array([2, 2, 3, -1], np.int32))
    pit = jnp.asarray(np.zeros(4, bool))
    f = np.asarray(flow_accumulation(land, rcv, pit, rounds=4))
    np.testing.assert_allclose(f[:3], [1, 1, 3])


def test_monotonic_enforce_chain():
    # 3-cell chain onto ocean with an inversion: elev [0.5, 0.6, 0.1], chain
    # 2→1→0→ocean(3). cell 2 (0.1) must be raised above cell 1 (0.6).
    elev = jnp.asarray(np.array([0.5, 0.6, 0.1, -0.2], np.float32))
    drain = jnp.asarray(np.array([3, 0, 1, -1], np.int32))
    is_ocean = jnp.asarray(np.array([False, False, False, True]))
    valid = jnp.asarray(np.ones(4, bool))
    out = np.asarray(monotonic_enforce(elev, drain, is_ocean, valid, rounds=4))
    assert out[2] > out[1] > out[0] > 0


def test_stream_power_erodes_uphill_cells():
    # single chain: 2(high)→1→0→ocean(3); erosion should lower 1 and 2
    elev = jnp.asarray(np.array([0.2, 0.5, 1.0, -0.3], np.float32))
    is_ocean = jnp.asarray(np.array([False, False, False, True]))
    valid = jnp.asarray(np.ones(4, bool))
    rcv = jnp.asarray(np.array([3, 0, 1, -1], np.int32))
    dist = jnp.asarray(np.full(4, 0.01, np.float32))
    pit = jnp.asarray(np.zeros(4, bool))
    flow = jnp.asarray(np.array([3.0, 2.0, 1.0, 0.0], np.float32))
    out = np.asarray(stream_power_solve(
        elev, is_ocean, valid, rcv, dist, pit, flow,
        jnp.float32(0.0003), jnp.float32(0.5), jnp.float32(1.0)))
    assert out[2] < 1.0
    assert out[1] <= 0.5 + 1e-5
    assert (out[:3] >= 0).all()
    # still monotone down the chain
    assert out[2] >= out[1] >= out[0] >= 0


def test_thermal_conserves_mass(terrain):
    g, gd, e = terrain
    is_ocean = (e <= 0) & gd.valid
    from planet_heightmap_generation_tpu.erosion.composite import _edge_lengths
    band_dist, rem_dist = _edge_lengths(gd)
    out = thermal_step(e, is_ocean, gd.valid, gd.band_off, gd.band_mask,
                       band_dist, gd.rem_src, gd.rem_dst, rem_dist,
                       jnp.float32(0.1), jnp.float32(0.15))
    land = np.asarray((~is_ocean) & gd.valid)
    d = np.asarray(out) - np.asarray(e)
    assert abs(d[land].sum()) < 1e-2          # land-to-land transport conserves
    assert np.abs(d).max() > 0                 # something moved
    assert (d[~land] == 0).all()


def test_smooth_reduces_variance(terrain):
    g, gd, e = terrain
    is_ocean = (e <= 0) & gd.valid
    out = smooth_elevation(e, is_ocean, gd.valid, *gd.bands,
                           3, jnp.float32(0.5))
    land = np.asarray((~is_ocean) & gd.valid)
    assert np.var(np.asarray(out)[land]) < np.var(np.asarray(e)[land])


def test_sharpen_caps_at_1_5x(terrain):
    g, gd, e = terrain
    is_ocean = (e <= 0) & gd.valid
    out = np.asarray(sharpen_ridges(e, is_ocean, gd.valid, *gd.bands,
                                    4, jnp.float32(0.3)))
    land = np.asarray((~is_ocean) & gd.valid)
    assert (out[land] <= np.asarray(e)[land] * 1.5 + 1e-6).all()


def test_soil_creep_locks_coast(terrain):
    g, gd, e = terrain
    is_ocean = (e <= 0) & gd.valid
    coastal = np.asarray(
        (~is_ocean) & gd.valid
        & jnp.any(is_ocean[gd.nbr_idx] & gd.nbr_mask, axis=1))
    out = np.asarray(apply_soil_creep(e, is_ocean, gd.valid, *gd.bands,
                                      3, jnp.float32(0.1125)))
    np.testing.assert_array_equal(out[coastal], np.asarray(e)[coastal])
    np.testing.assert_array_equal(out[np.asarray(is_ocean)],
                                  np.asarray(e)[np.asarray(is_ocean)])


def test_full_post_processing(terrain):
    g, gd, e = terrain
    out, delta = run_post_processing(
        gd, e, seed=3,
        params=dict(smoothing=0.3, glacial_erosion=0.2,
                    hydraulic_erosion=0.5, thermal_erosion=0.1,
                    ridge_sharpening=0.35, terrain_warp=0.5))
    out = np.asarray(out)
    assert np.isfinite(out).all()
    assert np.abs(np.asarray(delta)).max() > 0
    # erosion shouldn't change ocean/land balance drastically
    before = (np.asarray(e)[: g.n_cells] > 0).mean()
    after = (out[: g.n_cells] > 0).mean()
    assert abs(before - after) < 0.15


def test_pointer_doubling_exact_on_1m_chain():
    """Scale proof (VERDICT r1 #9): flow accumulation and monotonic drainage
    must be EXACT on a maximal-depth dendritic chain at production-like N —
    rounds scale as ceil(log2 N)+2 rather than a fixed constant."""
    import jax.numpy as jnp
    from planet_heightmap_generation_tpu.erosion.fluvial import (
        flow_accumulation, _log_rounds)
    from planet_heightmap_generation_tpu.erosion.flood import (
        monotonic_enforce, EPS)

    n = 1 << 20  # 1,048,576-cell single chain: depth is the worst case
    assert (1 << _log_rounds(n)) >= n
    rcv = jnp.arange(-1, n - 1, dtype=jnp.int32)   # i drains to i-1
    land = jnp.ones(n, bool).at[0].set(False)      # cell 0 = ocean
    is_pit = jnp.zeros(n, bool)

    flow = np.asarray(flow_accumulation(land, rcv, is_pit))
    # land cell i receives all cells above it: flow[i] = n - i
    for i in (1, 2, 1000, n // 2, n - 2, n - 1):
        assert flow[i] == n - i, (i, flow[i])

    elev = jnp.full(n, 0.5, jnp.float32)
    is_ocean = ~land
    valid = jnp.ones(n, bool)
    out = np.asarray(monotonic_enforce(elev, rcv, is_ocean, valid))
    # exact fixpoint: elev'[i] = 0.5 + (i-1)*EPS -> strictly monotonic
    for i in (2, 1000, n // 2, n - 1):
        expect = 0.5 + (i - 1) * EPS
        assert abs(out[i] - expect) < 5e-4, (i, out[i], expect)
    diffs = np.diff(out[1:])
    assert (diffs > 0).all(), "drainage not strictly monotonic"


def test_flood_island_in_inland_sea_not_filled(tiny_sphere):
    """Land enclosed by an inland sea is unreachable by the open-ocean
    flood; its surface must stay at its elevation (reference js/terrain-
    post.js:106 init) — round-2 regression: `big` leaked +5e8 into such
    cells at >=160K cells."""
    import jax.numpy as jnp
    from planet_heightmap_generation_tpu.erosion.flood import (
        priority_flood_carve)

    g = tiny_sphere
    elev = np.full(g.n_padded, 0.5, np.float32)
    elev[~g.valid] = 0.0
    # main open ocean: polar cap
    cap = g.pos[:, 2] > 0.6
    elev[cap & g.valid] = -0.5
    # island: pick a southern cell, make its entire neighborhood an inland
    # sea (disconnected from the cap)
    south = np.flatnonzero((g.pos[:, 2] < -0.5) & g.valid)
    c = int(south[0])
    ring = g.nbr_idx[c][g.nbr_mask[c]]
    elev[ring] = -0.4
    elev_j = jnp.asarray(elev)
    is_ocean = (elev_j <= 0) & jnp.asarray(g.valid)

    gd2 = to_device(g)
    out, drain, surface = priority_flood_carve(
        elev_j, is_ocean, gd2.valid, *gd2.bands, jnp.float32(0.5))
    out = np.asarray(out)
    assert np.isfinite(out).all()
    assert out.max() < 10.0, f"flood leaked big values: {out.max()}"
    # the island keeps (approximately) its elevation
    assert abs(out[c] - 0.5) < 0.05, out[c]
