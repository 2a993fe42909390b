"""Reproduce bench_profile's 10ms/iter LU claim in isolation, with a
data-dependent chain so XLA cannot elide or overlap iterations."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import lu_factor, lu_solve

B, n, m = 32, 206, 176
N = n + m
ITERS = 50

rng = np.random.default_rng(0)
K0 = jnp.asarray(rng.standard_normal((B, N, N)), jnp.float32) + \
    10.0 * jnp.eye(N, dtype=jnp.float32)
Z = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    dt = time.perf_counter() - t0
    print(f"{name:40s} {dt/ITERS*1000:8.2f} ms/iter (x{ITERS})", flush=True)
    return out


# exact copy of bench_profile's lu_only
def loop(body):
    @jax.jit
    def run(Z):
        def step(i, acc):
            return acc + body(Z + 1e-6 * i, i)
        return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.float32))
    return run


def lu_only(Zb, i):
    fac = lu_factor(K0 + 1e-6 * i)
    r = jnp.ones((B, N), jnp.float32)
    s = lu_solve(fac, r) + lu_solve(fac, 2 * r) + lu_solve(fac, 3 * r)
    return jnp.sum(s)


timeit("lu_only (exact profile copy)", loop(lu_only), Z)


# chained: K depends on previous solve -> strictly sequential
@jax.jit
def chained(K, r):
    def step(i, carry):
        K, r = carry
        fac = lu_factor(K)
        s = lu_solve(fac, r)
        K = K + 1e-9 * s[:, :, None] * s[:, None, :]
        return (K, s)
    K, s = jax.lax.fori_loop(0, ITERS, step, (K, r))
    return jnp.sum(s)


out = jax.block_until_ready(chained(K0, jnp.ones((B, N), jnp.float32)))
t0 = time.perf_counter()
out = jax.block_until_ready(chained(K0, jnp.ones((B, N), jnp.float32)))
print(f"{'lu chained':40s} {(time.perf_counter()-t0)/ITERS*1000:8.2f} "
      f"ms/iter (x{ITERS})  sum={out}", flush=True)
