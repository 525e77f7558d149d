"""Pallas sweep kernels vs the jnp banded path (interpret mode on CPU).

The production TPU path runs the banded sweep loops (BFS, ε-fill,
smoothing) through ops/sweep_pallas.py; on this CPU test backend the
kernels execute under pltpu.force_tpu_interpret_mode(), so the kernel
LOGIC (window assembly, static-shift slicing + lane rolls, bitmask gates,
baked barrier/seed semantics, inner-sweep relaxation, remainder epilogue)
is exercised without TPU hardware. Contracts tested:

- to-fixpoint BFS: bit-identical to the jnp loop (unique fixpoint, min is
  order-independent, identical per-path cost sums);
- value-capped BFS: consumer view min(d, cap) identical to the hop-capped
  jnp loop for unit costs; exact below 0.6·cap for random costs;
- ε-fill: bit-identical surface and drain pointers (unique fixpoint).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from planet_heightmap_generation_tpu.ops.sweep_pallas import force_pallas
from planet_heightmap_generation_tpu.ops.banded import (
    _bfs_hops_multi_pallas, _bfs_hops_multi_jnp)


@pytest.fixture(scope="module")
def small_graph(tiny_sphere):
    from planet_heightmap_generation_tpu.mesh.device import to_device

    return tiny_sphere, to_device(tiny_sphere)


def _inputs(gd, f=2, seed=0):
    n = gd.n_padded
    rng = np.random.default_rng(seed)
    seeds = jnp.asarray((rng.random((n, f)) < 0.004)
                        & np.asarray(gd.valid)[:, None])
    barrier = jnp.asarray(rng.random((n, f)) < 0.05)
    cost = jnp.asarray(rng.random((n, f)).astype(np.float32) + 0.5)
    return seeds, barrier, cost


def test_bfs_fixpoint_bit_identical(small_graph):
    _, gd = small_graph
    seeds, barrier, _ = _inputs(gd)
    a = np.asarray(_bfs_hops_multi_jnp(seeds, barrier, *gd.bands,
                                       max_hops=0))
    with pltpu.force_tpu_interpret_mode(), force_pallas():
        b = np.asarray(_bfs_hops_multi_pallas(seeds, barrier, *gd.bands))
    np.testing.assert_array_equal(np.nan_to_num(a, posinf=1e30),
                                  np.nan_to_num(b, posinf=1e30))


def test_bfs_value_cap_consumer_equal(small_graph):
    _, gd = small_graph
    seeds, barrier, _ = _inputs(gd, seed=1)
    cap = 12
    a = np.asarray(_bfs_hops_multi_jnp(seeds, barrier, *gd.bands,
                                       max_hops=cap))
    with pltpu.force_tpu_interpret_mode(), force_pallas():
        b = np.asarray(_bfs_hops_multi_pallas(seeds, barrier, *gd.bands,
                                              value_cap=float(cap)))
    np.testing.assert_array_equal(
        np.minimum(np.nan_to_num(a, posinf=1e9), cap),
        np.minimum(np.nan_to_num(b, posinf=1e9), cap))


def test_bfs_rand_cost_exact_below_cap(small_graph):
    _, gd = small_graph
    seeds, barrier, cost = _inputs(gd, seed=2)
    capv = 10.0
    ref = np.asarray(_bfs_hops_multi_jnp(seeds, barrier, *gd.bands,
                                         max_hops=100, rand_cost=cost))
    with pltpu.force_tpu_interpret_mode(), force_pallas():
        b = np.asarray(_bfs_hops_multi_pallas(seeds, barrier, *gd.bands,
                                              value_cap=capv,
                                              rand_cost=cost))
    sel = np.isfinite(ref) & (ref < 0.6 * capv)
    assert sel.sum() > 100
    np.testing.assert_array_equal(ref[sel], b[sel])


def test_flood_fill_bit_identical(small_graph):
    from planet_heightmap_generation_tpu.erosion.flood import (
        _epsilon_fill_pallas, _epsilon_fill_jnp, open_ocean_mask)
    from planet_heightmap_generation_tpu.ops.noise import SimplexNoise

    g, gd = small_graph
    sn = SimplexNoise(3.0)
    pos = g.pos
    e = np.asarray(sn.fbm(pos[:, 0] * 2, pos[:, 1] * 2, pos[:, 2] * 2))
    e = np.where(g.valid, e * 0.6 + 0.25 * pos[:, 2], 0.0).astype(np.float32)
    elev = jnp.asarray(e)
    is_ocean = (elev <= 0) & gd.valid
    oo = open_ocean_mask(is_ocean, gd.valid, *gd.bands)
    sa, da = _epsilon_fill_jnp(elev, is_ocean, oo, gd.valid, *gd.bands)
    with pltpu.force_tpu_interpret_mode(), force_pallas():
        sb, db = _epsilon_fill_pallas(elev, is_ocean, oo, gd.valid,
                                      *gd.bands)
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
    np.testing.assert_array_equal(np.asarray(da), np.asarray(db))


def test_smoothing_matches_jnp(small_graph):
    from planet_heightmap_generation_tpu.ops.banded import (
        _smooth_field_pallas, _smooth_field_jnp,
        _smooth_masked_pallas, _smooth_masked_jnp)

    _, gd = small_graph
    n = gd.n_padded
    rng = np.random.default_rng(3)
    field = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    mask = jnp.asarray(rng.random(n) < 0.6) & gd.valid

    a = np.asarray(_smooth_field_jnp(field, *gd.bands, 3))
    with pltpu.force_tpu_interpret_mode(), force_pallas():
        b = np.asarray(_smooth_field_pallas(field, *gd.bands, 3))
    np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-6)

    a = np.asarray(_smooth_masked_jnp(f2, mask, *gd.bands, 2))
    with pltpu.force_tpu_interpret_mode(), force_pallas():
        b = np.asarray(_smooth_masked_pallas(f2, mask, *gd.bands, 2))
    np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-6)


def test_components_pallas_matches_jnp(small_graph):
    """Root-hooked components: pallas core == jnp path == scipy, for both
    the in_set (ocean/land) and gated-equality (plate) variants. The
    fixpoint (component-min labels) is schedule-independent, so all three
    agree exactly."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components as scipy_cc
    from planet_heightmap_generation_tpu.erosion.flood import (
        connected_components_banded, _cc_inset_jnp)
    from planet_heightmap_generation_tpu.ops.banded import (
        connected_components_gated, _cc_gated_jnp)

    g, gd = small_graph
    n = gd.n_padded
    rng = np.random.default_rng(7)
    # a few blobby classes via thresholded smooth noise
    field = rng.standard_normal(n)
    for _ in range(4):
        field = field + field[np.asarray(g.nbr_idx)].mean(1)
    in_set = jnp.asarray((field > 0) & np.asarray(gd.valid))

    a = np.asarray(_cc_inset_jnp(in_set, *gd.bands))
    with pltpu.force_tpu_interpret_mode(), force_pallas():
        b = np.asarray(connected_components_banded(in_set, *gd.bands))
    np.testing.assert_array_equal(a, b)

    # scipy ground truth on the member subgraph (min-index canonical form)
    mask = np.asarray(in_set)
    src = np.repeat(np.arange(n), g.nbr_idx.shape[1])
    dst = np.asarray(g.nbr_idx).ravel()
    ok = np.asarray(g.nbr_mask).ravel() & mask[src] & mask[dst]
    m = coo_matrix((np.ones(ok.sum()), (src[ok], dst[ok])), shape=(n, n))
    _, lab = scipy_cc(m, directed=False)
    # canonicalize scipy labels to min member index per component
    import collections
    mn = collections.defaultdict(lambda: n)
    for i in np.flatnonzero(mask):
        mn[lab[i]] = min(mn[lab[i]], i)
    expect = np.asarray([mn[lab[i]] if mask[i] else n for i in range(n)])
    np.testing.assert_array_equal(a, expect)

    classes = jnp.asarray((field * 2).astype(np.int32) % 3)
    a = np.asarray(_cc_gated_jnp(classes, *gd.bands))
    with pltpu.force_tpu_interpret_mode(), force_pallas():
        b = np.asarray(connected_components_gated(classes, *gd.bands))
    np.testing.assert_array_equal(a, b)


def test_rain_shadow_pallas_matches_jnp(small_graph):
    """Directed rain-shadow sweep: the pallas kernel (weights recomputed
    in VMEM) reproduces the banded jnp loop to 1 ULP — same band order,
    same Jacobi hop semantics, remainder edges applied on pre-hop values
    in both; the residual difference is FMA contraction in the in-kernel
    dot products vs the jnp einsum (measured ≤3e-7 relative on ~2% of
    cells — the weights, not the propagated values, so it does not
    compound across hops)."""
    from planet_heightmap_generation_tpu.climate.precipitation import (
        _rain_shadow2_pallas, _rain_shadow2_jnp)

    g, gd = small_graph
    n = gd.n_padded
    rng = np.random.default_rng(11)
    elev = jnp.asarray(
        (rng.standard_normal(n) * 0.4).astype(np.float32)) * gd.valid
    height_km = jnp.maximum(0.0, elev) * 6.0
    is_land = (elev > 0) & gd.valid
    wind3d2 = jnp.asarray(
        rng.standard_normal((n, 2, 3)).astype(np.float32) * 0.3)
    wdg2 = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32) * 0.1)

    a = np.asarray(_rain_shadow2_jnp(
        gd.pos, elev, height_km, is_land, wind3d2, wdg2, *gd.bands, 6, 4))
    with pltpu.force_tpu_interpret_mode(), force_pallas():
        b = np.asarray(_rain_shadow2_pallas(
            gd.pos, elev, height_km, is_land, wind3d2, wdg2,
            *gd.bands, 6, 4))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    # the sign structure (shadow vs windward decision) must agree exactly
    np.testing.assert_array_equal(np.sign(np.round(a * 1e4)),
                                  np.sign(np.round(b * 1e4)))


def test_diffuse_warmth_pallas_matches_jnp(small_graph):
    """Freeze-restore warmth diffusion: pallas smoother + per-pass frozen
    select == the jnp banded loop (within the same mul-by-inverse vs
    divide tolerance as the plain smoothing kernels)."""
    from planet_heightmap_generation_tpu.climate.temperature import (
        _diffuse_warmth_jnp, _diffuse_warmth_pallas)

    g, gd = small_graph
    n = gd.n_padded
    rng = np.random.default_rng(13)
    warmth2 = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
    is_land = jnp.asarray(rng.random(n) < 0.35) & gd.valid
    p_cont = jnp.asarray(rng.random(n).astype(np.float32))

    a = np.asarray(_diffuse_warmth_jnp(warmth2, is_land, p_cont,
                                       *gd.bands, 5))
    with pltpu.force_tpu_interpret_mode(), force_pallas():
        b = np.asarray(_diffuse_warmth_pallas(warmth2, is_land, p_cont,
                                              *gd.bands, 5))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_stress_pallas_matches_jnp(small_graph):
    """Stress relax: pallas inner sweeps vs the jnp synchronous loop. The
    fixpoint max_s st0(s)·eff(s)^hops is schedule-independent away from
    exact-tie collisions (measure-zero on random data); the hop cap binds
    only at the 0.005 threshold fringe, so values match to float tolerance
    and the adopted subduct payloads agree wherever stress does."""
    from planet_heightmap_generation_tpu.ops.banded import (
        _propagate_stress_pallas, _propagate_stress_jnp, band_gate,
        rem_gate_eq)

    g, gd = small_graph
    n = gd.n_padded
    rng = np.random.default_rng(3)
    # synthetic plate map -> same-plate gates
    plate = jnp.asarray(rng.integers(0, 5, n).astype(np.int32))
    gate = band_gate(plate, gd.band_off, gd.band_mask)
    rg = rem_gate_eq(plate, gd.rem_src, gd.rem_dst)
    st0 = jnp.asarray(
        np.where(rng.random(n) < 0.01, rng.random(n).astype(np.float32),
                 0.0))
    sf0 = jnp.asarray(rng.random(n).astype(np.float32))
    ocean = jnp.asarray(rng.random(n) < 0.3)
    decay, sub_decay, passes = 0.93, 0.78, 40

    a_st, a_sf = _propagate_stress_jnp(
        st0[:, None], sf0[:, None], (gate,), rg[:, None], ocean[:, None],
        gd.band_off, gd.band_mask, gd.rem_src, gd.rem_dst,
        jnp.float32(decay), jnp.float32(sub_decay), passes)
    with pltpu.force_tpu_interpret_mode(), force_pallas():
        b_st, b_sf = _propagate_stress_pallas(
            st0[:, None], sf0[:, None], (gate,), rg[:, None],
            ocean[:, None], gd.band_off, gd.band_mask, gd.rem_src,
            gd.rem_dst, decay, sub_decay, passes)
    a_st, b_st = np.asarray(a_st[:, 0]), np.asarray(b_st[:, 0])
    a_sf, b_sf = np.asarray(a_sf[:, 0]), np.asarray(b_sf[:, 0])
    # fringe cells (value ~0.005·decay^±2·inner) may differ by the hop-cap
    # slack; everything above the fringe must agree
    core = (a_st > 0.007) | (b_st > 0.007)
    match = np.isclose(a_st, b_st, atol=1e-6)
    frac = (match | ~core).mean()
    assert frac == 1.0, f"stress mismatch on {(~(match | ~core)).sum()} cells"
    sf_match = np.isclose(a_sf, b_sf, atol=1e-6) | ~match
    assert sf_match.mean() > 0.999


def test_warp_pallas_matches_jnp(small_graph):
    """Domain-warp candidate propagation: pallas inner sweeps vs the
    synchronous jnp loop. Equal-distance ties resolve by schedule, so the
    comparison is on the MERGED elevation (sub-edge-length assignment
    differences move a cell's source at most one ring) with a small
    mismatch allowance."""
    from planet_heightmap_generation_tpu.erosion.warp import (
        _warp_terrain_pallas, _warp_terrain_jnp)
    from planet_heightmap_generation_tpu.ops.noise import tables, fbm

    g, gd = small_graph
    t = tables(7.0)
    pos = gd.pos
    elev = fbm(t, pos[:, 0] * 3, pos[:, 1] * 3, pos[:, 2] * 3, 4) * 0.5
    elev = jnp.where(gd.valid, elev, 0.0)
    hot = jnp.zeros_like(elev)
    a = np.asarray(_warp_terrain_jnp(
        elev, pos, gd.valid, *gd.bands, noise_t=tables(9.0),
        strength=jnp.float32(0.5), hotspot=hot, max_steps=20))
    with pltpu.force_tpu_interpret_mode(), force_pallas():
        b = np.asarray(_warp_terrain_pallas(
            elev, pos, gd.valid, *gd.bands, noise_t=tables(9.0),
            strength=jnp.float32(0.5), hotspot=hot, max_steps=20))
    close = np.isclose(a, b, atol=1e-5)
    assert close.mean() > 0.995, f"warp mismatch on {(~close).sum()} cells"
    # and the differing cells still carry plausible warped elevations
    assert np.abs(a - b).max() < 0.5
