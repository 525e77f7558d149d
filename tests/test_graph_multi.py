"""Batched graph kernels ≡ their single-field originals.

TPU gathers with arbitrary [N,K] indices are index-processing bound, so the
elevation stage batches its BFS fields into single packed-gather loops
(ops/graph.py bfs_hops_multi / band_bfs). These must be drop-in equivalent
to the per-field kernels they replaced.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from planet_heightmap_generation_tpu.ops.graph import (
    bfs_hops, bfs_hops_multi, carry_bfs, band_bfs, hash01)


@pytest.fixture(scope="module")
def g(tiny_sphere):
    return tiny_sphere


def _masks(g, salt):
    idx = np.arange(g.n_padded)
    h = np.asarray(hash01(jnp.asarray(idx), salt))
    return jnp.asarray((h < 0.01) & g.valid), jnp.asarray((h > 0.9) & g.valid)


def test_bfs_hops_multi_matches_single(g):
    nbr_idx = jnp.asarray(g.nbr_idx)
    nbr_mask = jnp.asarray(g.nbr_mask)
    idx = jnp.arange(g.n_padded, dtype=jnp.int32)
    seeds, barriers, costs = [], [], []
    for k in range(3):
        s, b = _masks(g, 10 + k)
        seeds.append(s)
        barriers.append(b)
        costs.append(0.5 + hash01(idx, 100 + k))
    multi = bfs_hops_multi(jnp.stack(seeds, 1), jnp.stack(barriers, 1),
                           nbr_idx, nbr_mask, rand_cost=jnp.stack(costs, 1))
    for k in range(3):
        single = bfs_hops(seeds[k], barriers[k], nbr_idx, nbr_mask,
                          rand_cost=costs[k])
        np.testing.assert_allclose(np.asarray(multi[:, k]),
                                   np.asarray(single), rtol=1e-6)


def test_band_bfs_matches_carry_bfs(g):
    nbr_idx = jnp.asarray(g.nbr_idx)
    nbr_mask = jnp.asarray(g.nbr_mask)
    idx = jnp.arange(g.n_padded, dtype=jnp.int32)
    same = (hash01(idx, 55)[nbr_idx] > 0.3)  # arbitrary edge gate
    fields = []
    for k in range(3):
        s, a = _masks(g, 20 + k)
        allow = a | s | (hash01(idx, 60 + k) > 0.2)
        carry = jnp.where(s, hash01(idx, 70 + k), 0.0)[None]
        hops = 4 + 2 * k
        use_gate = k == 1
        fields.append((s, allow, carry, hops, use_gate))

    max_hops = max(f[3] for f in fields)
    dist_m, _, carr_m = band_bfs(
        jnp.stack([f[0] for f in fields], 1),
        jnp.stack([f[2][0] for f in fields], 1)[None],
        nbr_idx, nbr_mask, max_hops=max_hops,
        hops_cap=jnp.asarray([f[3] for f in fields], jnp.int32),
        allow=jnp.stack([f[1] for f in fields], 1),
        edge_gate=same,
        use_gate=jnp.asarray([f[4] for f in fields]),
        num_carry=1)

    for k, (s, allow, carry, hops, use_gate) in enumerate(fields):
        d, _, c = carry_bfs(s, carry, nbr_idx, nbr_mask, max_hops=hops,
                            allow=allow,
                            edge_same=same if use_gate else None,
                            num_carry=1)
        np.testing.assert_allclose(np.asarray(dist_m[:, k]), np.asarray(d),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(carr_m[0, :, k]),
                                   np.asarray(c[0]), rtol=1e-6)


def test_band_bfs_tie_matches_carry(g):
    nbr_idx = jnp.asarray(g.nbr_idx)
    nbr_mask = jnp.asarray(g.nbr_mask)
    idx = jnp.arange(g.n_padded, dtype=jnp.int32)
    s, _ = _masks(g, 33)
    tie = jnp.where(s, hash01(idx, 44), 0.0)
    carry = jnp.stack([tie, hash01(idx, 45) * s, hash01(idx, 46) * s])
    d, t, c = carry_bfs(s, carry, nbr_idx, nbr_mask, max_hops=8, tie=tie)
    d2, t2, c2 = band_bfs(s[:, None], carry[:, :, None], nbr_idx, nbr_mask,
                          max_hops=8, tie=tie[:, None], num_carry=3)
    np.testing.assert_allclose(np.asarray(d2[:, 0]), np.asarray(d), rtol=1e-6)
    for j in range(3):
        np.testing.assert_allclose(np.asarray(c2[j, :, 0]),
                                   np.asarray(c[j]), rtol=1e-6)
