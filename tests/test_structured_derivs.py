"""Compressed block derivatives + factor/solve-split KKT vs dense autodiff.

The compressed 2-/3-coloring recovery must match dense jacfwd/hessian
exactly (same graph, different seeds), and BTBFactor must solve the
assembled KKT system to fp64 accuracy.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opensim_moco_tpu.examples import (double_pendulum_swingup_study,
                                       hanging_muscle_study,
                                       sliding_mass_study)
from opensim_moco_tpu.solver.kkt import CompiledStructure
from opensim_moco_tpu.solver.structured import (
    BlockDerivatives, assemble_kkt_blocks, block_H_diag, block_H_matvec,
    blocks_to_dense_H, blocks_to_dense_J, btb_factor, btb_solve, pack_rhs,
    unpack_sol)


def _setup(study, n_int_attr=None):
    tr = study.transcription()
    nlp = tr.make_nlp()
    st = nlp.structure
    assert st is not None
    cs = CompiledStructure(st.var_blocks, st.con_blocks, st.border_vars,
                           st.border_cons, nlp.n, nlp.m)
    rng = np.random.default_rng(0)
    z = jnp.asarray(np.asarray(tr.initial_guess()) +
                    0.01 * rng.standard_normal(nlp.n))
    nu = jnp.asarray(rng.standard_normal(nlp.m))
    return tr, nlp, cs, z, nu


CASES = [
    lambda: sliding_mass_study(num_mesh_intervals=6, scheme="trapezoidal"),
    lambda: sliding_mass_study(num_mesh_intervals=5),
    lambda: hanging_muscle_study(6, ignore_tendon_compliance=True,
                                 ignore_activation_dynamics=True),
    lambda: double_pendulum_swingup_study(num_mesh_intervals=5),
]


@pytest.mark.parametrize("mk", CASES)
def test_jac_blocks_match_dense(mk):
    tr, nlp, cs, z, nu = _setup(mk())
    bd = BlockDerivatives(cs, nlp.constraints, nlp.objective)
    jb = jax.jit(bd.jac_blocks)(z)
    J_blocks = blocks_to_dense_J(jb, cs)
    J_dense = np.asarray(jax.jacfwd(nlp.constraints)(z))
    np.testing.assert_allclose(J_blocks, J_dense, rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("mk", CASES)
def test_hess_blocks_match_dense(mk):
    tr, nlp, cs, z, nu = _setup(mk())
    bd = BlockDerivatives(cs, nlp.constraints, nlp.objective)

    def lag(zz, nn):
        return nlp.objective(zz) + nlp.constraints(zz) @ nn

    lag_grad = jax.grad(lag, argnums=0)
    hb = jax.jit(bd.hess_blocks, static_argnums=0)(lag_grad, z, nu)
    H_blocks = blocks_to_dense_H(hb, cs)
    H_dense = np.asarray(jax.jacfwd(lag_grad)(z, nu))
    np.testing.assert_allclose(H_blocks, H_dense, rtol=1e-8, atol=1e-9)


def test_btb_factor_solves_kkt():
    tr, nlp, cs, z, nu = _setup(
        double_pendulum_swingup_study(num_mesh_intervals=5))
    bd = BlockDerivatives(cs, nlp.constraints, nlp.objective)

    def lag(zz, nn):
        return nlp.objective(zz) + nlp.constraints(zz) @ nn

    lag_grad = jax.grad(lag, argnums=0)
    jb = bd.jac_blocks(z)
    hb = bd.hess_blocks(lag_grad, z, nu)
    rng = np.random.default_rng(1)
    sigma = jnp.asarray(rng.uniform(0.5, 2.0, nlp.n))
    delta_w, delta_c = 1e-3, 1e-8
    D, L, B, C = assemble_kkt_blocks(hb, jb, sigma, delta_w, delta_c, cs)
    fac = btb_factor(D, L, B, C)
    r1 = jnp.asarray(rng.standard_normal(nlp.n))
    r2 = jnp.asarray(rng.standard_normal(nlp.m))
    rhs_T, rhs_C = pack_rhs(r1, r2, None, cs)
    x, w = btb_solve(fac, rhs_T, rhs_C)
    dz, dnu = unpack_sol(x, w, cs, z.dtype)

    # H matvec / diag helpers against dense blocks
    v = jnp.asarray(rng.standard_normal(nlp.n))
    Hd = blocks_to_dense_H(hb, cs)
    np.testing.assert_allclose(np.asarray(block_H_matvec(hb, cs, v)),
                               Hd @ np.asarray(v), rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(block_H_diag(hb, cs, z.dtype)),
                               np.diag(Hd), rtol=1e-9, atol=1e-12)

    # dense ground truth
    H = blocks_to_dense_H(hb, cs) + np.diag(np.asarray(sigma)) + \
        delta_w * np.eye(nlp.n)
    J = blocks_to_dense_J(jb, cs)
    K = np.block([[H, J.T], [J, -delta_c * np.eye(nlp.m)]])
    sol = np.linalg.solve(K, np.concatenate([r1, r2]))
    np.testing.assert_allclose(np.asarray(dz), sol[:nlp.n], rtol=1e-7,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(dnu), sol[nlp.n:], rtol=1e-7,
                               atol=1e-8)


def test_jac_row_norms():
    tr, nlp, cs, z, nu = _setup(sliding_mass_study(num_mesh_intervals=5))
    bd = BlockDerivatives(cs, nlp.constraints, nlp.objective)
    norms = bd.jac_row_inf_norms(z)
    J = np.abs(np.asarray(jax.jacfwd(nlp.constraints)(z)))
    np.testing.assert_allclose(norms, J.max(axis=1), rtol=1e-9, atol=1e-12)
