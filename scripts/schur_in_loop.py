"""chol-schur KKT factor+solves in a chained fori_loop at bench shapes
(n=206, m=176, B=32) — honest loop-context timing, comparable to
lu_bisect.py's ~11 ms/iter for the pivoted-LU path."""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, n, m = 32, 206, 176
ITERS = 20
dtype = jnp.float32
tri = jax.lax.linalg.triangular_solve

rng = np.random.default_rng(0)
A = rng.standard_normal((B, n, n)).astype(np.float32)
Hd0 = jnp.asarray(A @ A.transpose(0, 2, 1) +
                  10.0 * np.eye(n, dtype=np.float32))
J0 = jnp.asarray(rng.standard_normal((B, m, n)).astype(np.float32))
r10 = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
r20 = jnp.asarray(rng.standard_normal((B, m)).astype(np.float32))


@jax.jit
def schur_loop(Hd, J, r1, r2):
    def one(Hd, J, r1, r2):
        Lh = jnp.linalg.cholesky(Hd)
        Y = tri(Lh, J.T, left_side=True, lower=True)
        S = Y.T @ Y + 1e-8 * jnp.eye(m, dtype=dtype)
        Ls = jnp.linalg.cholesky(S)

        def solve(r1, r2):
            w = tri(Lh, r1[:, None], left_side=True, lower=True)[:, 0]
            rnu = Y.T @ w - r2
            t = tri(Ls, rnu[:, None], left_side=True, lower=True)
            dnu = tri(Ls, t, left_side=True, lower=True,
                      transpose_a=True)[:, 0]
            dz = tri(Lh, (w - Y @ dnu)[:, None], left_side=True, lower=True,
                     transpose_a=True)[:, 0]
            return dz, dnu

        a1, b1 = solve(r1, r2)
        a2, b2 = solve(2 * r1, r2)
        a3, b3 = solve(r1, 3 * r2)
        return a1 + a2 + a3, b1 + b2 + b3

    def step(i, carry):
        Hd, s1, s2 = carry
        dz, dnu = jax.vmap(one)(Hd, J0, r10 + s1, r20 + s2)
        Hd = Hd + 1e-9 * dz[:, :, None] * dz[:, None, :]
        return (Hd, 1e-6 * dz, 1e-6 * dnu)

    Hd, s1, s2 = jax.lax.fori_loop(0, ITERS, step, (Hd,
                                                    jnp.zeros_like(r10),
                                                    jnp.zeros_like(r20)))
    return jnp.sum(s1) + jnp.sum(s2)


out = jax.block_until_ready(schur_loop(Hd0, J0, r10, r20))
t0 = time.perf_counter()
out = jax.block_until_ready(schur_loop(Hd0, J0, r10 + 1e-5, r20))
dt = time.perf_counter() - t0
print(f"schur factor+3solves in loop: {dt/ITERS*1000:8.2f} ms/iter "
      f"sum={out}", flush=True)
