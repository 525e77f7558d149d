"""Device graph-kernel tests: majority smoothing, connected components,
flood assignment, BFS hop distances (ops/graph.py)."""

import numpy as np
import jax.numpy as jnp

from planet_heightmap_generation_tpu.ops.graph import (
    majority_smooth,
    connected_components,
    flood_assign,
    bfs_hops,
    masked_mean_nbr,
)


def _line_graph(n):
    """Simple path graph 0-1-2-...-n-1 as padded arrays (K=2)."""
    nbr_idx = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, 2))
    nbr_mask = np.zeros((n, 2), dtype=bool)
    for i in range(n):
        if i > 0:
            nbr_idx[i, 0] = i - 1
            nbr_mask[i, 0] = True
        if i < n - 1:
            nbr_idx[i, 1] = i + 1
            nbr_mask[i, 1] = True
    return jnp.asarray(nbr_idx), jnp.asarray(nbr_mask)


def test_connected_components_line():
    nbr_idx, nbr_mask = _line_graph(10)
    # cut the line at 5: same-class edges only within {0..4} and {5..9}
    cls = jnp.asarray((np.arange(10) >= 5).astype(np.int32))
    same = cls[nbr_idx] == cls[:, None]
    labels = np.asarray(connected_components(nbr_idx, nbr_mask, same))
    assert (labels[:5] == 0).all()
    assert (labels[5:] == 5).all()


def test_connected_components_sphere(tiny_sphere):
    g = tiny_sphere
    nbr_idx = jnp.asarray(g.nbr_idx)
    nbr_mask = jnp.asarray(g.nbr_mask)
    same = jnp.ones_like(nbr_mask)
    labels = np.asarray(connected_components(nbr_idx, nbr_mask, same))
    # all real cells in one component; padding cells isolated
    assert (labels[: g.n_cells] == 0).all()
    assert (labels[g.n_cells:] == np.arange(g.n_cells, g.n_padded)).all()


def test_majority_smooth_removes_tendril(tiny_sphere):
    g = tiny_sphere
    rs = np.random.RandomState(0)
    labels = np.zeros(g.n_padded, dtype=np.int32)
    # single-cell islands of label 1 should be absorbed
    islands = rs.choice(g.n_cells, 20, replace=False)
    labels[islands] = 1
    out = np.asarray(majority_smooth(
        jnp.asarray(labels), jnp.asarray(g.nbr_idx), jnp.asarray(g.nbr_mask),
        jnp.zeros(g.n_padded, dtype=bool), num_passes=2,
    ))
    assert (out[: g.n_cells] == 0).mean() > 0.999


def test_flood_assign_line():
    nbr_idx, nbr_mask = _line_graph(8)
    value = jnp.asarray(np.array([7, 0, 0, 0, 0, 0, 0, 3], dtype=np.int32))
    frontier = jnp.asarray(np.array([1, 0, 0, 0, 0, 0, 0, 1], dtype=bool))
    val, reached = flood_assign(value, frontier, nbr_idx, nbr_mask)
    val = np.asarray(val)
    assert np.asarray(reached).all()
    assert (val[:4] == 7).all()
    assert (val[4:] == 3).all()


def test_bfs_hops_line():
    nbr_idx, nbr_mask = _line_graph(10)
    seeds = jnp.asarray(np.eye(1, 10, 0, dtype=bool)[0])
    barrier = jnp.asarray(np.zeros(10, dtype=bool))
    d = np.asarray(bfs_hops(seeds, barrier, nbr_idx, nbr_mask))
    np.testing.assert_allclose(d, np.arange(10, dtype=np.float32))


def test_bfs_hops_barrier():
    nbr_idx, nbr_mask = _line_graph(10)
    seeds = jnp.asarray(np.eye(1, 10, 0, dtype=bool)[0])
    barrier = np.zeros(10, dtype=bool)
    barrier[5] = True
    d = np.asarray(bfs_hops(seeds, jnp.asarray(barrier), nbr_idx, nbr_mask))
    assert np.isinf(d[5:]).all()
    np.testing.assert_allclose(d[:5], np.arange(5, dtype=np.float32))


def test_bfs_hops_max_hops():
    nbr_idx, nbr_mask = _line_graph(10)
    seeds = jnp.asarray(np.eye(1, 10, 0, dtype=bool)[0])
    barrier = jnp.asarray(np.zeros(10, dtype=bool))
    d = np.asarray(bfs_hops(seeds, barrier, nbr_idx, nbr_mask, max_hops=3))
    assert np.isfinite(d[:4]).all()
    assert np.isinf(d[4:]).all()


def test_masked_mean(tiny_sphere):
    g = tiny_sphere
    f = jnp.asarray(np.ones(g.n_padded, dtype=np.float32))
    m = np.asarray(masked_mean_nbr(f, jnp.asarray(g.nbr_idx), jnp.asarray(g.nbr_mask)))
    np.testing.assert_allclose(m[: g.n_cells], 1.0, atol=1e-6)
