"""Bisect why lu_repro's loop shows 10ms/iter but lu_in_loop's shows ~0.
Variants a..e run in one process on TPU."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import lu_factor, lu_solve

B, n, m = 32, 206, 176
N = n + m
ITERS = 20

rng = np.random.default_rng(0)
K0 = jnp.asarray(rng.standard_normal((B, N, N)), jnp.float32) + \
    10.0 * jnp.eye(N, dtype=jnp.float32)
r0 = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)


def t(name, fn, *args):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    dt = time.perf_counter() - t0
    print(f"{name:44s} {dt/ITERS*1000:8.2f} ms/iter", flush=True)


# a) closure K0, scalar acc, 3 solves (lu_repro style)
@jax.jit
def a():
    def step(i, acc):
        fac = lu_factor(K0 + 1e-6 * i)
        r = jnp.ones((B, N), jnp.float32)
        s = lu_solve(fac, r) + lu_solve(fac, 2 * r) + lu_solve(fac, 3 * r)
        return acc + jnp.sum(s)
    return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.float32))


# b) closure K0, scalar acc, 1 solve
@jax.jit
def b():
    def step(i, acc):
        fac = lu_factor(K0 + 1e-6 * i)
        return acc + jnp.sum(lu_solve(fac, r0))
    return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.float32))


# c) K passed as argument, scalar acc, 1 solve
@jax.jit
def c(K, r):
    def step(i, acc):
        fac = lu_factor(K + 1e-6 * i)
        return acc + jnp.sum(lu_solve(fac, r))
    return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.float32))


# d) K argument, vector acc (lu_in_loop style)
@jax.jit
def d(K, r):
    def step(i, acc):
        fac = lu_factor(K + 1e-6 * i)
        return acc + lu_solve(fac, r)
    return jax.lax.fori_loop(0, ITERS, step, jnp.zeros_like(r))


# e) vmapped per-lane lu_factor of single (N,N) (ipm dense path style)
@jax.jit
def e(K, r):
    def one_lane(Kl, rl):
        def step(i, acc):
            fac = lu_factor(Kl + 1e-6 * i)
            return acc + lu_solve(fac, rl)
        return jax.lax.fori_loop(0, ITERS, step, jnp.zeros_like(rl))
    return jax.vmap(one_lane)(K, r)


t("a closure,scalar,3solve", a)
t("b closure,scalar,1solve", b)
t("c arg,scalar,1solve", c, K0, r0)
t("d arg,vector,1solve", d, K0, r0)
t("e vmap-lane loop", e, K0, r0)
