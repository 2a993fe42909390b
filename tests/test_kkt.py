"""Structured (block-tridiagonal + bordered) KKT solver vs dense."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opensim_moco_tpu.solver.kkt import (block_tridiag_solve,
                                         bordered_block_tridiag_solve,
                                         dense_from_blocks)


def _random_spd_tridiag(N, nb, seed=0):
    rng = np.random.default_rng(seed)
    L = rng.normal(size=(N - 1, nb, nb)) * 0.3
    D = rng.normal(size=(N, nb, nb))
    D = 0.5 * (D + np.transpose(D, (0, 2, 1)))
    # diagonal dominance for well-posedness
    D += np.eye(nb) * (2.0 * nb)
    return jnp.asarray(D), jnp.asarray(L)


def test_block_tridiag_matches_dense():
    N, nb = 12, 7
    D, L = _random_spd_tridiag(N, nb)
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.normal(size=(N, nb)))
    x = block_tridiag_solve(D, L, r)
    K = dense_from_blocks(D, L)
    x_dense = jnp.linalg.solve(K, r.ravel()).reshape(N, nb)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_dense),
                               rtol=1e-9, atol=1e-10)


def test_block_tridiag_multi_rhs():
    N, nb, m = 8, 5, 3
    D, L = _random_spd_tridiag(N, nb, seed=2)
    rng = np.random.default_rng(3)
    R = jnp.asarray(rng.normal(size=(N, nb, m)))
    X = block_tridiag_solve(D, L, R)
    K = dense_from_blocks(D, L)
    Xd = jnp.linalg.solve(K, R.reshape(N * nb, m)).reshape(N, nb, m)
    np.testing.assert_allclose(np.asarray(X), np.asarray(Xd), rtol=1e-9,
                               atol=1e-10)


def test_bordered_solve_matches_dense():
    N, nb, k = 10, 6, 4
    D, L = _random_spd_tridiag(N, nb, seed=4)
    rng = np.random.default_rng(5)
    B = jnp.asarray(rng.normal(size=(N, nb, k)) * 0.2)
    C = rng.normal(size=(k, k))
    C = jnp.asarray(0.5 * (C + C.T) + np.eye(k) * (2 * k))
    rT = jnp.asarray(rng.normal(size=(N, nb)))
    rC = jnp.asarray(rng.normal(size=(k,)))
    x, w = bordered_block_tridiag_solve(D, L, B, C, rT, rC)
    K = dense_from_blocks(D, L, B, C)
    sol = jnp.linalg.solve(K, jnp.concatenate([rT.ravel(), rC]))
    np.testing.assert_allclose(np.asarray(x).ravel(),
                               np.asarray(sol[:N * nb]), rtol=1e-8,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(w), np.asarray(sol[N * nb:]),
                               rtol=1e-8, atol=1e-9)


def test_indefinite_kkt_style_system():
    """Quasi-definite saddle blocks (H pos def, -delta dual block) — the
    structure the IPM produces."""
    N, nprim, ndual = 6, 4, 3
    nb = nprim + ndual
    rng = np.random.default_rng(6)
    D = np.zeros((N, nb, nb))
    for i in range(N):
        H = rng.normal(size=(nprim, nprim))
        H = H @ H.T + np.eye(nprim)
        J = rng.normal(size=(ndual, nprim))
        D[i, :nprim, :nprim] = H
        D[i, nprim:, :nprim] = J
        D[i, :nprim, nprim:] = J.T
        D[i, nprim:, nprim:] = -1e-6 * np.eye(ndual)
    L = rng.normal(size=(N - 1, nb, nb)) * 0.1
    D, L = jnp.asarray(D), jnp.asarray(L)
    r = jnp.asarray(rng.normal(size=(N, nb)))
    x = block_tridiag_solve(D, L, r)
    K = dense_from_blocks(D, L)
    xd = jnp.linalg.solve(K, r.ravel()).reshape(N, nb)
    np.testing.assert_allclose(np.asarray(x), np.asarray(xd), rtol=1e-6,
                               atol=1e-8)


def test_jit_and_scan_compatible():
    N, nb = 20, 8
    D, L = _random_spd_tridiag(N, nb, seed=7)
    r = jnp.asarray(np.random.default_rng(8).normal(size=(N, nb)))
    f = jax.jit(block_tridiag_solve)
    x = f(D, L, r)
    K = dense_from_blocks(D, L)
    resid = K @ x.ravel() - r.ravel()
    assert float(jnp.max(jnp.abs(resid))) < 1e-9
