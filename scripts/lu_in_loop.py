"""Isolate: batched dense LU / chol-schur cost as a top-level dispatch vs
inside a chained lax.fori_loop (the IPM solver's actual context)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import lu_factor, lu_solve

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
n, m = 206, 176
N = n + m
dtype = jnp.float32
ITERS = 20

rng = np.random.default_rng(0)
K0 = jnp.asarray(rng.standard_normal((B, N, N)), dtype) + \
    10.0 * jnp.eye(N, dtype=dtype)
r0 = jnp.asarray(rng.standard_normal((B, N)), dtype)


@jax.jit
def lu_once(K, r):
    fac = lu_factor(K)
    return lu_solve(fac, r)


@jax.jit
def lu_loop(K, r):
    def step(i, acc):
        fac = lu_factor(K + 1e-6 * i)
        return acc + lu_solve(fac, r)
    return jax.lax.fori_loop(0, ITERS, step, jnp.zeros_like(r))


@jax.jit
def chol_once(K, r):
    L = jnp.linalg.cholesky(K @ K.transpose(0, 2, 1) +
                            10 * jnp.eye(N, dtype=dtype))
    t = jax.lax.linalg.triangular_solve(L, r[..., None], left_side=True,
                                        lower=True)
    return t[..., 0]


@jax.jit
def chol_loop(K, r):
    def step(i, acc):
        L = jnp.linalg.cholesky(K @ K.transpose(0, 2, 1) +
                                (10 + 1e-6 * i) * jnp.eye(N, dtype=dtype))
        t = jax.lax.linalg.triangular_solve(L, r[..., None], left_side=True,
                                            lower=True)
        return acc + t[..., 0]
    return jax.lax.fori_loop(0, ITERS, step, jnp.zeros_like(r))


def bench(name, fn, per_call):
    out = jax.block_until_ready(fn(K0, r0))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = jax.block_until_ready(fn(K0, r0))
    dt = (time.perf_counter() - t0) / reps / per_call
    print(f"B={B} {name:14s} {dt*1000:8.2f} ms/op", flush=True)


bench("lu once", lu_once, 1)
bench("lu in loop", lu_loop, ITERS)
bench("chol once", chol_once, 1)
bench("chol in loop", chol_loop, ITERS)
