"""Structured KKT solvers.

Direct-collocation KKT systems are block-banded in the time axis: defect
constraints couple only adjacent grid points (the reference documents the
same time-grouped sparsity for its Jacobians at CasOCTranscription.h:219-387),
while a thin "border" (initial/final time, parameters, endpoint/periodicity
constraints) couples everything. Ordered by mesh interval, the KKT matrix is

    K = [[T,   B ],       T: block-tridiagonal (N blocks of size nb)
         [B^T, C ]]       B: (N*nb, k) border, C: (k, k), k small

This module provides a bordered block-tridiagonal factor/solve built on
`lax.scan` (sequential over intervals, dense per-block ops that batch well
on the MXU) — O(N nb^3) instead of O((N nb)^3) for the dense path. This is
the round-2 engine for full-resolution gait problems and the substrate for
the Pallas pipeline kernels; the IPM consumes it through the same
``kkt_solve`` interface as the dense path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def block_tridiag_solve(D, L, rhs):
    """Solve T x = rhs for block-tridiagonal symmetric-indefinite T.

    D: (N, nb, nb) diagonal blocks; L: (N-1, nb, nb) sub-diagonal blocks
    (T[i+1, i] = L[i]; T[i, i+1] = L[i]^T); rhs: (N, nb) or (N, nb, m).

    Block LU without pivoting across blocks (each block solve uses dense
    LU with partial pivoting internally) — adequate for regularized IPM
    KKT systems which are quasi-definite.
    """
    single = rhs.ndim == 2
    if single:
        rhs = rhs[..., None]
    N, nb, _ = D.shape

    # forward elimination: S_0 = D_0; S_i = D_i - L_{i-1} S_{i-1}^{-1} L_{i-1}^T
    def fwd(carry, inp):
        S_prev, y_prev = carry
        Di, Li, ri = inp  # Li = L[i-1]
        W = jnp.linalg.solve(S_prev, Li.T)  # S_prev^{-1} L^T
        Si = Di - Li @ W
        yi = ri - Li @ jnp.linalg.solve(S_prev, y_prev)
        return (Si, yi), (Si, yi, W)

    S0 = D[0]
    y0 = rhs[0]
    (SN, yN), (S_all, y_all, W_all) = jax.lax.scan(
        fwd, (S0, y0), (D[1:], L, rhs[1:]))
    S_full = jnp.concatenate([S0[None], S_all], axis=0)
    y_full = jnp.concatenate([y0[None], y_all], axis=0)

    # back substitution: x_N = S_N^{-1} y_N; x_i = S_i^{-1}(y_i - L_i^T x_{i+1})
    xN = jnp.linalg.solve(S_full[-1], y_full[-1])

    def bwd(x_next, inp):
        Si, yi, Li = inp
        xi = jnp.linalg.solve(Si, yi - Li.T @ x_next)
        return xi, xi

    _, xs = jax.lax.scan(bwd, xN, (S_full[:-1], y_full[:-1], L),
                         reverse=True)
    x = jnp.concatenate([xs, xN[None]], axis=0)
    return x[..., 0] if single else x


def bordered_block_tridiag_solve(D, L, B, C, rhs_T, rhs_C):
    """Solve [[T, B], [B^T, C]] [x; w] = [rhs_T; rhs_C].

    D/L define block-tridiagonal T as in :func:`block_tridiag_solve`;
    B: (N, nb, k) border blocks; C: (k, k); rhs_T: (N, nb); rhs_C: (k,).

    Schur complement on the border: (C - B^T T^{-1} B) w = rhs_C - B^T T^{-1} rhs_T.
    """
    N, nb, k = B.shape
    # solve T [rhs_T, B] in one multi-rhs pass
    RHS = jnp.concatenate([rhs_T[..., None], B], axis=-1)  # (N, nb, 1+k)
    sol = block_tridiag_solve(D, L, RHS)
    Tinv_r = sol[..., 0]  # (N, nb)
    Tinv_B = sol[..., 1:]  # (N, nb, k)
    BtTinvB = jnp.einsum("nik,nij->kj", B, Tinv_B)
    BtTinvr = jnp.einsum("nik,ni->k", B, Tinv_r)
    S = C - BtTinvB
    w = jnp.linalg.solve(S, rhs_C - BtTinvr)
    x = Tinv_r - jnp.einsum("nik,k->ni", Tinv_B, w)
    return x, w


def dense_from_blocks(D, L, B=None, C=None):
    """Assemble the dense matrix (testing utility)."""
    N, nb, _ = D.shape
    n = N * nb
    k = 0 if C is None else C.shape[0]
    K = jnp.zeros((n + k, n + k), dtype=D.dtype)
    for i in range(N):
        K = K.at[i * nb:(i + 1) * nb, i * nb:(i + 1) * nb].set(D[i])
        if i < N - 1:
            K = K.at[(i + 1) * nb:(i + 2) * nb, i * nb:(i + 1) * nb].set(
                L[i])
            K = K.at[i * nb:(i + 1) * nb, (i + 1) * nb:(i + 2) * nb].set(
                L[i].T)
        if k:
            K = K.at[i * nb:(i + 1) * nb, n:].set(B[i])
            K = K.at[n:, i * nb:(i + 1) * nb].set(B[i].T)
    if k:
        K = K.at[n:, n:].set(C)
    return K
