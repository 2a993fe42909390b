"""Multi-device agreement tests on the virtual 8-device CPU mesh.

SURVEY §4 implication: the sharded paths must agree with the replicated
ones — the analogue of the reference's solver-agreement cross-validation
(TEMPLATE_TEST_CASE over both solver stacks, testMocoInterface.cpp:85).
conftest.py forces 8 CPU devices via xla_force_host_platform_device_count.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opensim_moco_tpu.solver.kkt import (block_tridiag_solve,
                                         block_tridiag_solve_partitioned,
                                         dense_from_blocks)


def _random_btd(N, nb, seed=0):
    rng = np.random.default_rng(seed)
    D = rng.normal(size=(N, nb, nb))
    D = 0.5 * (D + D.transpose(0, 2, 1)) + 6.0 * np.eye(nb)  # dominant
    L = 0.3 * rng.normal(size=(N - 1, nb, nb))
    rhs = rng.normal(size=(N, nb))
    return jnp.asarray(D), jnp.asarray(L), jnp.asarray(rhs)


def test_partitioned_block_tridiag_matches_sequential():
    """SPIKE/partition parallel-in-time KKT solve == sequential scan, on
    an 8-device grid mesh (the cyclic-reduction-class kernel of SURVEY
    §2.8's mesh-interval axis)."""
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must force 8 virtual devices"
    N, nb, Pn = 24, 5, 8
    D, L, rhs = _random_btd(N, nb, seed=1)
    x_seq = block_tridiag_solve(D, L, rhs)

    mesh = Mesh(np.array(devs[:Pn]), ("grid",))
    # per-shard L rows: L[i] couples local i -> i+1; pad the final row
    L_pad = jnp.concatenate([L, jnp.zeros((1, nb, nb))], axis=0)

    from jax import shard_map

    f = shard_map(
        lambda d, l, r: block_tridiag_solve_partitioned(d, l, r, "grid"),
        mesh=mesh,
        in_specs=(P("grid"), P("grid"), P("grid")),
        out_specs=P("grid"))
    x_par = jax.jit(f)(D, L_pad, rhs)
    np.testing.assert_allclose(np.asarray(x_par), np.asarray(x_seq),
                               rtol=1e-8, atol=1e-9)
    # also validate against the dense solve
    T = np.asarray(dense_from_blocks(D, L))
    x_dense = np.linalg.solve(T, np.asarray(rhs).ravel()).reshape(N, nb)
    np.testing.assert_allclose(np.asarray(x_par), x_dense, rtol=1e-7,
                               atol=1e-8)


def test_partitioned_solve_multirhs_shapes():
    """Edge cases: 1 device worth of blocks per shard boundary effects."""
    devs = jax.devices()
    N, nb, Pn = 16, 3, 8  # Nl = 2
    D, L, rhs = _random_btd(N, nb, seed=2)
    x_seq = block_tridiag_solve(D, L, rhs)
    mesh = Mesh(np.array(devs[:Pn]), ("grid",))
    L_pad = jnp.concatenate([L, jnp.zeros((1, nb, nb))], axis=0)
    from jax import shard_map

    f = shard_map(
        lambda d, l, r: block_tridiag_solve_partitioned(d, l, r, "grid"),
        mesh=mesh,
        in_specs=(P("grid"), P("grid"), P("grid")),
        out_specs=P("grid"))
    x_par = jax.jit(f)(D, L_pad, rhs)
    np.testing.assert_allclose(np.asarray(x_par), np.asarray(x_seq),
                               rtol=1e-8, atol=1e-9)


def test_batched_solve_device_count_agreement():
    """DP-batch axis: vmapped solves sharded over 1 vs 8 devices produce
    identical results (per-lane independence)."""
    from opensim_moco_tpu.examples import sliding_mass_study
    from opensim_moco_tpu.parallel import batch_guesses
    from opensim_moco_tpu.solver.ipm import IPMOptions, make_solver

    study = sliding_mass_study(num_mesh_intervals=8)
    tr = study.transcription()
    nlp = tr.make_nlp()
    z0 = tr.initial_guess()
    opts = IPMOptions(tol=1e-6, max_iter=120)
    solve = make_solver(nlp, opts, scale_z0=z0)
    B = 8
    Z0 = batch_guesses(tr, B, scale=0.03, seed=1)

    # replicated (single-device) reference
    res1 = jax.jit(jax.vmap(solve))(Z0)

    mesh = Mesh(np.array(jax.devices()[:8]), ("batch",))
    sh = NamedSharding(mesh, P("batch"))
    Z0_sharded = jax.device_put(Z0, sh)
    res8 = jax.jit(jax.vmap(solve))(Z0_sharded)

    np.testing.assert_allclose(np.asarray(res8.f), np.asarray(res1.f),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(res8.z), np.asarray(res1.z),
                               rtol=1e-7, atol=1e-9)
    assert bool(jnp.all(res8.converged == res1.converged))


def test_bordered_partitioned_solve_matches_sequential():
    """Partitioned bordered solve (T sharded over 8 devices, border Schur
    psum-reduced) == sequential bordered solve."""
    from jax import shard_map

    from opensim_moco_tpu.solver.kkt import (
        bordered_block_tridiag_solve, bordered_block_tridiag_solve_partitioned)

    N, nb, k, Pn = 24, 4, 3, 8
    rng = np.random.default_rng(3)
    D, L, rhs = _random_btd(N, nb, seed=3)
    B = jnp.asarray(0.2 * rng.normal(size=(N, nb, k)))
    C = jnp.asarray(-np.eye(k) - 0.1 * rng.normal(size=(k, k)))
    rhs_C = jnp.asarray(rng.normal(size=(k,)))
    x_seq, w_seq = bordered_block_tridiag_solve(D, L, B, C, rhs, rhs_C)

    mesh = Mesh(np.array(jax.devices()[:Pn]), ("grid",))
    L_pad = jnp.concatenate([L, jnp.zeros((1, nb, nb))], axis=0)
    f = shard_map(
        lambda d, l, b, c, rT, rC: bordered_block_tridiag_solve_partitioned(
            d, l, b, c, rT, rC, "grid"),
        mesh=mesh,
        in_specs=(P("grid"), P("grid"), P("grid"), P(), P("grid"), P()),
        out_specs=(P("grid"), P()))
    x_par, w_par = jax.jit(f)(D, L_pad, B, C, rhs, rhs_C)
    np.testing.assert_allclose(np.asarray(x_par), np.asarray(x_seq),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(w_par), np.asarray(w_seq),
                               rtol=1e-8, atol=1e-9)


def test_grid_sharded_full_ipm_solve_agreement():
    """End-to-end IPM solve of ONE problem with its KKT factorization
    sharded over the mesh-interval axis of an 8-device grid mesh
    (SURVEY §2.8) — converges and agrees with the replicated solve."""
    from opensim_moco_tpu.examples import kirk_min_effort_study
    from opensim_moco_tpu.solver.ipm import IPMOptions, make_solver

    study = kirk_min_effort_study(num_mesh_intervals=24,
                                  scheme="trapezoidal")
    tr = study.transcription()
    nlp = tr.make_nlp()
    z0 = jnp.asarray(tr.initial_guess())
    opts = IPMOptions(tol=1e-7, max_iter=200)

    solve_rep = make_solver(nlp, opts, scale_z0=z0)
    res_rep = jax.jit(solve_rep)(z0)
    assert bool(res_rep.converged)

    mesh = Mesh(np.array(jax.devices()[:8]), ("grid",))
    solve_grid = make_solver(nlp, opts, scale_z0=z0, grid_mesh=mesh)
    res_grid = jax.jit(solve_grid)(z0)
    assert bool(res_grid.converged)
    np.testing.assert_allclose(float(res_grid.f), float(res_rep.f),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res_grid.z),
                               np.asarray(res_rep.z), rtol=1e-5, atol=1e-7)


def test_multihost_batch_solve_single_process_degrades():
    """solve_batch_multihost on one process = batch sharded over the local
    8-device mesh; agrees with the replicated vmap (the multi-host entry
    point the driver can dry-run without a second host)."""
    from opensim_moco_tpu.examples import kirk_min_effort_study
    from opensim_moco_tpu.parallel import solve_batch_multihost
    from opensim_moco_tpu.parallel.batch import batch_guesses
    from opensim_moco_tpu.solver.ipm import IPMOptions, make_solver

    study = kirk_min_effort_study(num_mesh_intervals=10)
    tr = study.transcription()
    nlp = tr.make_nlp()
    z0 = tr.initial_guess()
    opts = IPMOptions(tol=1e-6, max_iter=120)
    solve = make_solver(nlp, opts, scale_z0=z0)
    Z0 = batch_guesses(tr, 8, scale=0.03, seed=2)

    res_rep = jax.jit(jax.vmap(solve))(Z0)
    res_mh = solve_batch_multihost(solve, np.asarray(Z0))
    np.testing.assert_allclose(np.asarray(res_mh.f), np.asarray(res_rep.f),
                               rtol=1e-9)
    assert bool(jnp.all(res_mh.converged == res_rep.converged))
