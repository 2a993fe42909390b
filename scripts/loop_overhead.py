"""Isolate while/fori-loop per-iteration overhead on the TPU runtime.

Compares: (a) one top-level batched LU; (b) fori_loop of K LUs inside one
jit; (c) same with cholesky+triangular solves; at B in {32, 128}.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import lu_factor, lu_solve

n, m = 206, 176
K = 50
dtype = jnp.float32
tri = jax.lax.linalg.triangular_solve


def bench(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(5):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / 5
    print(name, f"{dt*1000:.2f} ms", flush=True)


for B in (32, 128):
    rng = np.random.default_rng(0)
    A = rng.standard_normal((B, n + m, n + m)).astype(np.float32)
    K0 = jnp.asarray(A @ A.transpose(0, 2, 1) +
                     10.0 * np.eye(n + m, dtype=np.float32))
    r = jnp.ones((B, n + m), jnp.float32)

    @jax.jit
    def single_lu(K0, r):
        fac = lu_factor(K0)
        return lu_solve(fac, r)

    @jax.jit
    def loop_lu(K0, r):
        def step(i, acc):
            fac = lu_factor(K0 + 1e-6 * i)
            return acc + lu_solve(fac, r)
        return jax.lax.fori_loop(0, K, step, jnp.zeros_like(r))

    @jax.jit
    def loop_chol(K0, r):
        def step(i, acc):
            L = jnp.linalg.cholesky(K0 + 1e-6 * i)
            w = tri(L, (acc + r)[..., None], left_side=True, lower=True)
            s = tri(L, w, left_side=True, lower=True,
                    transpose_a=True)[..., 0]
            return acc + s
        return jax.lax.fori_loop(0, K, step, jnp.zeros_like(r))

    @jax.jit
    def loop_add(K0, r):
        def step(i, acc):
            return acc + jnp.sum(K0 * (1e-6 * i), axis=(1, 2))
        return jax.lax.fori_loop(0, K, step, jnp.zeros_like(r))

    bench(f"B={B} single LU (x1)     ", single_lu, K0, r)
    bench(f"B={B} fori 50x LU        ", loop_lu, K0, r)
    bench(f"B={B} fori 50x cholesky  ", loop_chol, K0, r)
    bench(f"B={B} fori 50x big add   ", loop_add, K0, r)
