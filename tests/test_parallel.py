"""Multi-device tests: sharded terrain step over a virtual 8-CPU mesh,
entrypoint compile checks (SURVEY.md §4d)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_dryrun_multichip():
    """Multi-chip sharding dry run over the virtual 8-device CPU mesh.
    Slow tier: 8 device threads time-share ONE core here, so the full
    two-phase dryrun (batched terrain step + engine generate sharded over
    cells) runs ~20 min wall."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_phase1_budgeted():
    """Fast-tier canary for the multi-chip gate: just the batched terrain
    step on the ('seed','cells') mesh, with a hard wall-clock budget so a
    collective-rendezvous deadlock (the round-2 regression) fails the fast
    tier in minutes instead of hiding behind the slow tier's 1500 s
    subprocess timeout."""
    import subprocess
    import sys
    import textwrap
    import os as _os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PLANET_JAX_CACHE"] = "0"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["XLA_FLAGS"] = flags
    for k in list(env):
        if k.startswith(("PALLAS_AXON", "AXON_", "TPU_")):
            env.pop(k)
    body = """
        import __graft_entry__ as ge
        import numpy as np
        import jax, jax.numpy as jnp
        from jax._src import compilation_cache as _cc
        jax.config.update('jax_compilation_cache_dir', None)
        _cc.reset_cache()
        from planet_heightmap_generation_tpu.parallel.sharding import (
            make_planet_mesh, batched_terrain_step)
        from planet_heightmap_generation_tpu.ops.noise import make_perm_tables
        g, gd, elev, _ = ge._tiny_graph(n=2000)
        mesh = make_planet_mesh(8, seed_parallel=4)
        b = 4
        elev_b = jnp.tile(elev[None, :], (b, 1))
        tabs = [make_perm_tables(float(s)) for s in range(b)]
        perm_b = jnp.asarray(np.stack([t[0] for t in tabs]))
        pm12_b = jnp.asarray(np.stack([t[1] for t in tabs]))
        step = batched_terrain_step(mesh, gd.band_off)
        with mesh:
            out = step(elev_b, gd.pos, gd.band_mask, gd.rem_src, gd.rem_dst,
                       gd.valid, perm_b, pm12_b)
            out.block_until_ready()
        assert bool(jnp.isfinite(out).all())
        print("SUBPROC_OK")
    """
    r = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(body)], env=env,
        capture_output=True, text=True, timeout=240,
        cwd=_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    assert r.returncode == 0 and "SUBPROC_OK" in r.stdout, (
        r.stdout[-2000:], r.stderr[-2000:])


def test_generate_batch_seed_sweep():
    """Seed sweep: distinct seeds → distinct planets; same seed → identical
    (determinism as the oracle, SURVEY.md §4)."""
    from planet_heightmap_generation_tpu.config import GenerationParams
    from planet_heightmap_generation_tpu.parallel import generate_batch

    params = GenerationParams(seed=0, n_cells=2000, n_plates=8,
                              num_continents=2, skip_climate=True)
    cpu = jax.devices("cpu")
    results = generate_batch(params, [3, 9, 3], devices=cpu[:4])
    assert len(results) == 3
    e0 = np.asarray(results[0].elevation)
    e1 = np.asarray(results[1].elevation)
    e2 = np.asarray(results[2].elevation)
    assert np.isfinite(e0).all() and np.isfinite(e1).all()
    assert not np.allclose(e0, e1)       # different seeds differ
    np.testing.assert_array_equal(e0, e2)  # same seed reproduces exactly
    assert results[0].params.seed == 3 and results[1].params.seed == 9


def test_sharded_matches_single_device():
    """The sharded batched step must produce the same values as the
    unsharded computation (virtual CPU mesh vs plain CPU eval)."""
    from planet_heightmap_generation_tpu.parallel.sharding import (
        make_planet_mesh, batched_terrain_step, terrain_step)
    from planet_heightmap_generation_tpu.ops.noise import make_perm_tables
    import __graft_entry__ as ge

    cpu = jax.devices("cpu")
    assert len(cpu) >= 8

    g, gd, elev, sn = ge._tiny_graph(n=1500)
    elev_b = jnp.stack([elev, elev * 0.5])
    perm, pm12 = make_perm_tables(1.0)
    perm_b = jnp.asarray(np.stack([perm, perm]))
    pm12_b = jnp.asarray(np.stack([pm12, pm12]))

    # uncommitted numpy args: the sharded jit places them per in_shardings
    args = tuple(np.asarray(a) for a in (
        elev_b, gd.pos, gd.band_mask, gd.rem_src, gd.rem_dst,
        gd.valid, perm_b, pm12_b))

    from planet_heightmap_generation_tpu.parallel.sharding import (
        no_persistent_cache)
    mesh = make_planet_mesh(8, seed_parallel=2, devices=cpu)
    step = batched_terrain_step(mesh, gd.band_off)
    with no_persistent_cache(), mesh:
        out = step(*args)

    cpu0 = cpu[0]
    ref_args = tuple(jax.device_put(a, cpu0) for a in (
        args[0][0], *args[1:6], args[6][0], args[7][0]))
    from functools import partial
    ref0 = jax.jit(partial(terrain_step, band_off=gd.band_off))(*ref_args)
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(ref0),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_sharded_engine_generate_matches_single():
    """The REAL pipeline (engine.generate, fused path) sharded over an
    8-device 'cells' mesh must equal the single-device run (VERDICT r1 #4).

    Runs in a fresh subprocess — the two fused-engine compiles here are
    among the largest XLA:CPU compiles in the suite, and this jaxlib's CPU
    compiler intermittently segfaults late in a long-lived process (see
    test_vmapped_batch_matches_sequential). Slow tier: the sharded fused
    compile alone runs many minutes on the 1-core host."""
    _run_in_fresh_process("""
        import numpy as np
        import jax
        from planet_heightmap_generation_tpu.config import GenerationParams
        from planet_heightmap_generation_tpu.pipeline import PlanetEngine
        from planet_heightmap_generation_tpu.parallel.sharding import \\
            cells_mesh

        params = GenerationParams(seed=11, n_cells=4000, n_plates=10,
                                  num_continents=2, skip_climate=True)
        single = PlanetEngine(timing=False).generate(params)
        mesh = cells_mesh(8, devices=jax.devices("cpu"))
        sharded = PlanetEngine(timing=False, mesh=mesh).generate(params)
        a = np.asarray(single.elevation)
        b = np.asarray(sharded.elevation)
        assert np.abs(a - b).max() < 2e-3, np.abs(a - b).max()
        assert sharded.diagnostics()["nan_count"] == 0
        print("SUBPROC_OK")
    """)


def _run_in_fresh_process(body: str):
    """Execute a test body in a fresh CPU-backend subprocess (8 virtual
    devices, no persistent compile cache) and assert it prints SUBPROC_OK."""
    import subprocess
    import sys
    import textwrap

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PLANET_JAX_CACHE"] = "0"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    for k in list(env):
        if k.startswith("PALLAS_AXON"):
            env.pop(k)
    r = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(body)], env=env,
        capture_output=True, text=True, timeout=2100,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0 and "SUBPROC_OK" in r.stdout, (
        r.stdout[-2000:], r.stderr[-2000:])


@pytest.mark.slow
def test_vmapped_batch_matches_sequential():
    """In-graph seed batching (vmap over the fused pipeline) must produce
    the same planets as the per-seed path (VERDICT r1 #5).

    Runs in a FRESH subprocess: the vmapped fused program is the largest
    XLA:CPU compile in the suite and this jaxlib's CPU compiler
    intermittently segfaults on it late in a long-lived test process
    (compiles fine in a fresh one — allocator/stack state dependent).
    Slow tier: two 4K fused CPU compiles, many minutes each."""
    _run_in_fresh_process("""
        import numpy as np
        from planet_heightmap_generation_tpu.config import GenerationParams
        from planet_heightmap_generation_tpu.parallel.batch import \\
            generate_batch

        params = GenerationParams(seed=0, n_cells=4000, n_plates=10,
                                  num_continents=2, skip_climate=True)
        seeds = [3, 4, 5]
        batched = generate_batch(params, seeds, vmap_chunk=3)
        seq = generate_batch(params, seeds, vmap_chunk=1)
        for b, s in zip(batched, seq):
            a1 = np.asarray(b.elevation)
            a2 = np.asarray(s.elevation)
            # vmapped vs per-seed programs fuse float sums differently and
            # the erosion recurrences amplify last-bit noise; the planets
            # must agree to ~1e-2 elevation units
            assert np.abs(a1 - a2).max() < 1.5e-2, "vmapped != sequential"
            assert b.diagnostics()["nan_count"] == 0
        print("SUBPROC_OK")
    """)


@pytest.mark.slow
def test_sharded_engine_generate_matches_single_64k():
    """Non-toy scale (VERDICT r1 next-round #3): the fused pipeline sharded
    over the 8-device 'cells' mesh equals the single-device run at 64K
    cells. Slow tier: two 64K fused CPU compiles + runs."""
    _run_in_fresh_process("""
        import numpy as np
        import jax
        from planet_heightmap_generation_tpu.config import GenerationParams
        from planet_heightmap_generation_tpu.pipeline import PlanetEngine
        from planet_heightmap_generation_tpu.parallel.sharding import \\
            cells_mesh

        params = GenerationParams(seed=7, n_cells=64_000, n_plates=24,
                                  num_continents=3, skip_climate=True)
        single = PlanetEngine(timing=False).generate(params)
        mesh = cells_mesh(8, devices=jax.devices("cpu"))
        sharded = PlanetEngine(timing=False, mesh=mesh).generate(params)
        a = np.asarray(single.elevation)
        b = np.asarray(sharded.elevation)
        # float reduction order differs across shard boundaries; the
        # erosion recurrences amplify last-bit noise
        assert np.abs(a - b).max() < 2e-3, np.abs(a - b).max()
        assert sharded.diagnostics()["nan_count"] == 0
        print("SUBPROC_OK")
    """)
