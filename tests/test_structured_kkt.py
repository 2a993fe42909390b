"""Structured (bordered block-tridiagonal) KKT path vs the dense path.

The structured factorization must reproduce the dense KKT solve exactly
(same matrix, different elimination order) on every problem class whose
transcription declares a structure: trapezoidal, Hermite-Simpson with
velocity-correction slacks + path constraints + endpoint constraints,
implicit dynamics, and prescribed kinematics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opensim_moco_tpu.solver.kkt import (CompiledStructure,
                                         structured_feasibility_step,
                                         structured_kkt_solve)


def _kkt_pieces(nlp, z, seed=0):
    rng = np.random.default_rng(seed)
    # gradient-based row scaling, as make_kernel applies before the solver
    # ever sees the Jacobian (unscaled multibody rows reach 1e18 and make
    # solution comparisons meaningless at any elimination order)
    J_raw = jax.jacfwd(nlp.constraints)(z)
    c_scale = jnp.minimum(1.0, 100.0 / jnp.maximum(
        jnp.max(jnp.abs(J_raw), axis=1), 1e-8))
    nu = jnp.asarray(rng.normal(size=nlp.m) * 0.1)
    J = J_raw * c_scale[:, None]
    lag = lambda zz: nlp.objective(zz) + \
        (c_scale * nlp.constraints(zz)) @ nu
    H = jax.jacfwd(jax.grad(lag))(z)
    H = H + jnp.diag(jnp.asarray(rng.uniform(0.5, 2.0, size=nlp.n)))
    r1 = jnp.asarray(rng.normal(size=nlp.n))
    r2 = jnp.asarray(rng.normal(size=nlp.m))
    return H, J, r1, r2


def _dense_solve(H, J, dw, dc, r1, r2):
    n = H.shape[0]
    m = J.shape[0]
    K = jnp.block([[H + dw * jnp.eye(n), J.T], [J, -dc * jnp.eye(m)]])
    sol = jnp.linalg.solve(K, jnp.concatenate([r1, r2]))
    return sol[:n], sol[n:]


def _check_problem(study, atol=1e-8):
    tr = study.transcription()
    nlp = tr.make_nlp()
    assert nlp.structure is not None
    cs = CompiledStructure(nlp.structure.var_blocks,
                           nlp.structure.con_blocks,
                           nlp.structure.border_vars,
                           nlp.structure.border_cons, nlp.n, nlp.m)
    z = jnp.asarray(tr.initial_guess())
    z = z + 0.01 * jnp.sin(jnp.arange(nlp.n))  # off the guess, generic
    H, J, r1, r2 = _kkt_pieces(nlp, z)
    dw, dc = 1e-6, 1e-8
    dz_d, dnu_d = _dense_solve(H, J, dw, dc, r1, r2)
    dz_s, dnu_s = structured_kkt_solve(H, J, dw, dc, cs, r1, r2)
    # exactness check via the KKT residual (solution-vs-solution agreement
    # degrades with conditioning even though both solves are correct)
    n, m = nlp.n, nlp.m
    K = jnp.block([[H + dw * jnp.eye(n), J.T], [J, -dc * jnp.eye(m)]])
    rhs = jnp.concatenate([r1, r2])
    xs = jnp.concatenate([dz_s, dnu_s])
    res_s = float(jnp.max(jnp.abs(K @ xs - rhs)))
    xscale = float(jnp.max(jnp.abs(xs))) * float(jnp.max(jnp.abs(K)))
    assert res_s <= 1e-10 * max(xscale, 1.0), (res_s, xscale)
    # and loose direct agreement with the dense solution
    scale = float(jnp.max(jnp.abs(dz_d))) + 1.0
    np.testing.assert_allclose(np.asarray(dz_s), np.asarray(dz_d),
                               atol=1e-3 * scale, rtol=1e-3)
    # feasibility step: (A A^T + d I)^{-1} c agreement
    A = J * 0.7
    c = nlp.constraints(z)
    c = c / (1.0 + jnp.abs(c))  # bounded rhs, conditioning-neutral
    y_s, x_s = structured_feasibility_step(A, 1e-8, cs, c)
    M = A @ A.T + 1e-8 * jnp.eye(nlp.m)
    res = float(jnp.max(jnp.abs(M @ x_s - c)))
    mscale = max(float(jnp.max(jnp.abs(x_s))) * float(jnp.max(jnp.abs(M))),
                 1.0)
    assert res <= 1e-10 * mscale, (res, mscale)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(A.T @ x_s),
                               rtol=1e-5, atol=1e-6)


def test_structured_matches_dense_sliding_mass_trapezoidal():
    from opensim_moco_tpu.examples import sliding_mass_study
    _check_problem(sliding_mass_study(num_mesh_intervals=8,
                                      scheme="trapezoidal"))


def test_structured_matches_dense_pendulum_hs_path_constraint():
    from opensim_moco_tpu.examples import double_pendulum_swingup_study
    _check_problem(double_pendulum_swingup_study(num_mesh_intervals=6))


def test_structured_matches_dense_hanging_muscle_implicit():
    from opensim_moco_tpu.examples import hanging_muscle_study
    _check_problem(hanging_muscle_study(6, ignore_tendon_compliance=False,
                                        ignore_activation_dynamics=False))


def test_structured_solve_end_to_end_equivalence():
    """Full IPM solves with dense vs structured KKT converge to the same
    solution (the linear algebra is exact in both paths)."""
    from opensim_moco_tpu.examples import sliding_mass_study
    from opensim_moco_tpu.solver.ipm import IPMOptions, make_solver

    study = sliding_mass_study(num_mesh_intervals=10, scheme="trapezoidal")
    tr = study.transcription()
    nlp = tr.make_nlp()
    z0 = tr.initial_guess()
    res_d = jax.jit(make_solver(nlp, IPMOptions(tol=1e-8, kkt="dense"),
                                scale_z0=z0))(jnp.asarray(z0))
    res_s = jax.jit(make_solver(nlp, IPMOptions(tol=1e-8, kkt="structured"),
                                scale_z0=z0))(jnp.asarray(z0))
    assert bool(res_d.converged) and bool(res_s.converged)
    np.testing.assert_allclose(float(res_s.f), float(res_d.f), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res_s.z), np.asarray(res_d.z),
                               atol=1e-6)


def test_structured_solve_hanging_muscle_full():
    """Hermite-Simpson + muscle dynamics, forced structured path."""
    from opensim_moco_tpu.examples import hanging_muscle_study
    from opensim_moco_tpu.solver.ipm import IPMOptions, make_solver

    study = hanging_muscle_study(25, ignore_tendon_compliance=True,
                                 ignore_activation_dynamics=True)
    tr = study.transcription()
    nlp = tr.make_nlp()
    z0 = tr.initial_guess()
    res_d = jax.jit(make_solver(
        nlp, IPMOptions(tol=1e-4, max_iter=400, kkt="dense"),
        scale_z0=z0))(jnp.asarray(z0))
    res_s = jax.jit(make_solver(
        nlp, IPMOptions(tol=1e-4, max_iter=400, kkt="structured"),
        scale_z0=z0))(jnp.asarray(z0))
    assert bool(res_d.converged), float(res_d.kkt_error)
    assert bool(res_s.converged), float(res_s.kkt_error)
    np.testing.assert_allclose(float(res_s.f), float(res_d.f), rtol=1e-4)
