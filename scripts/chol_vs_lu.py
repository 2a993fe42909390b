"""Microbench: batched Cholesky+Schur vs pivoted LU for KKT solves on TPU.

KKT = [[Hd, J^T], [J, -dc I]] with Hd PD (quasi-definite after IPM
regularization) — factorable without pivoting via Schur complement:
Lh = chol(Hd); Y = Lh^-1 J^T; S = Y^T Y + dc I; Ls = chol(S).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import lu_factor, lu_solve

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
n, m = 206, 176
dtype = jnp.float32

rng = np.random.default_rng(0)
A = rng.standard_normal((B, n, n)).astype(np.float32)
Hd = jnp.asarray(A @ A.transpose(0, 2, 1) + 10.0 * np.eye(n, dtype=np.float32))
J = jnp.asarray(rng.standard_normal((B, m, n)).astype(np.float32))
r1 = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
r2 = jnp.asarray(rng.standard_normal((B, m)).astype(np.float32))
dc = 1e-8


@jax.jit
def lu_path(Hd, J, r1, r2):
    def one(Hd, J, r1, r2):
        K = jnp.block([[Hd, J.T], [J, -dc * jnp.eye(m, dtype=dtype)]])
        fac = lu_factor(K)
        r = jnp.concatenate([r1, r2])
        s = lu_solve(fac, r) + lu_solve(fac, 2 * r) + lu_solve(fac, 3 * r)
        return s
    return jax.vmap(one)(Hd, J, r1, r2)


tri = jax.lax.linalg.triangular_solve


@jax.jit
def schur_path(Hd, J, r1, r2):
    def one(Hd, J, r1, r2):
        Lh = jnp.linalg.cholesky(Hd)
        # Y = Lh^-1 J^T  (n x m)
        Y = tri(Lh, J.T, left_side=True, lower=True)
        S = Y.T @ Y + dc * jnp.eye(m, dtype=dtype)
        Ls = jnp.linalg.cholesky(S)

        def solve(r1, r2):
            w = tri(Lh, r1[:, None], left_side=True, lower=True)[:, 0]
            rnu = Y.T @ w - r2
            t = tri(Ls, rnu[:, None], left_side=True, lower=True)
            dnu = tri(Ls, t, left_side=True, lower=True,
                      transpose_a=True)[:, 0]
            dz = tri(Lh, (w - Y @ dnu)[:, None], left_side=True, lower=True,
                     transpose_a=True)[:, 0]
            return jnp.concatenate([dz, -dnu])

        return solve(r1, r2) + solve(2 * r1, 2 * r2) + solve(3 * r1, 3 * r2)
    return jax.vmap(one)(Hd, J, r1, r2)


for name, fn in [("lu", lu_path), ("schur", schur_path)]:
    out = jax.block_until_ready(fn(Hd, J, r1, r2))
    t0 = time.perf_counter()
    for _ in range(20):
        out = jax.block_until_ready(fn(Hd, J, r1, r2))
    dt = (time.perf_counter() - t0) / 20
    print(f"B={B} {name}: {dt*1000:.2f} ms", flush=True)

# agreement
o1 = np.asarray(jax.device_get(lu_path(Hd, J, r1, r2)))
o2 = np.asarray(jax.device_get(schur_path(Hd, J, r1, r2)))
num = np.max(np.abs(o1 - o2)) / max(1.0, np.max(np.abs(o1)))
print("rel agreement:", num)
