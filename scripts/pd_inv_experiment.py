"""Quasi-definite KKT via recursive blocked PD inversion (matmuls only)
vs pivoted LU at bench shapes (n=206, m=176, B=32), chained-loop timing +
accuracy on a representative quasi-definite KKT."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import lu_factor, lu_solve

B, n, m = 32, 206, 176
ITERS = 20
dtype = jnp.float32

rng = np.random.default_rng(0)
A = rng.standard_normal((B, n, n)).astype(np.float32)
Hd0 = jnp.asarray(A @ A.transpose(0, 2, 1) / np.sqrt(n) +
                  1.0 * np.eye(n, dtype=np.float32))
J0 = jnp.asarray(rng.standard_normal((B, m, n)).astype(np.float32))
r10 = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
r20 = jnp.asarray(rng.standard_normal((B, m)).astype(np.float32))
dc = 1e-8


def pd_inv(M, base=64):
    s = M.shape[-1]
    if s <= base:
        return jnp.linalg.inv(M)
    h = s // 2
    A = M[..., :h, :h]
    Bb = M[..., :h, h:]
    D = M[..., h:, h:]
    Ai = pd_inv(A, base)
    AiB = Ai @ Bb
    S = D - Bb.swapaxes(-1, -2) @ AiB
    Si = pd_inv(S, base)
    TR = -AiB @ Si
    TL = Ai - TR @ AiB.swapaxes(-1, -2)
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([TR.swapaxes(-1, -2), Si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def factor_invschur(Hd, J):
    Hdi = pd_inv(Hd)
    Y = J @ Hdi  # (m, n)
    S = Y @ J.swapaxes(-1, -2) + dc * jnp.eye(m, dtype=dtype)
    Si = pd_inv(S)
    return Hdi, Y, Si


def solve_invschur(fac, r1, r2):
    Hdi, Y, Si = fac
    dnu = (Si @ (Y @ r1[..., None] - r2[..., None]))[..., 0]
    dz = (Hdi @ (r1 - (Y.swapaxes(-1, -2) @ dnu[..., None])[..., 0]
                 )[..., None])[..., 0]
    return dz, dnu


@jax.jit
def invschur_loop(Hd, J, r1, r2):
    def step(i, carry):
        Hd, s1 = carry
        fac = factor_invschur(Hd, J)
        a1, b1 = solve_invschur(fac, r1 + s1, r2)
        a2, b2 = solve_invschur(fac, 2 * r1, r2)
        a3, b3 = solve_invschur(fac, r1, 3 * r2)
        dz = a1 + a2 + a3
        Hd = Hd + 1e-9 * dz[:, :, None] * dz[:, None, :]
        return (Hd, 1e-6 * dz)
    Hd, s1 = jax.lax.fori_loop(0, ITERS, step, (Hd, jnp.zeros_like(r10)))
    return jnp.sum(s1)


@jax.jit
def lu_loop(Hd, J, r1, r2):
    def step(i, carry):
        K0, s1 = carry
        fac = lu_factor(K0)
        r = jnp.concatenate([r1 + s1, r2], axis=1)
        s = lu_solve(fac, r) + lu_solve(fac, 2 * r) + lu_solve(fac, 3 * r)
        dz = s[:, :n]
        K0 = K0 + 1e-9 * dz[:, :, None] * dz[:, None, :]
        return (K0, 1e-6 * dz)
    K0 = jnp.concatenate([
        jnp.concatenate([Hd, J.swapaxes(-1, -2)], axis=2),
        jnp.concatenate([J, -dc * jnp.eye(m, dtype)[None].repeat(B, 0)],
                        axis=2)], axis=1)
    K0, s1 = jax.lax.fori_loop(0, ITERS, step, (K0, jnp.zeros_like(r10)))
    return jnp.sum(s1)


for name, fn in [("invschur", invschur_loop), ("lu", lu_loop)]:
    out = jax.block_until_ready(fn(Hd0, J0, r10, r20))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(Hd0, J0, r10 + 1e-5, r20))
    dt = time.perf_counter() - t0
    print(f"{name:10s} {dt/ITERS*1000:8.2f} ms/iter sum={float(out):.5g}",
          flush=True)

# accuracy vs LU on one quasi-definite KKT
K = np.block([[np.asarray(Hd0[0]), np.asarray(J0[0]).T],
              [np.asarray(J0[0]), -dc * np.eye(m, dtype=np.float32)]])
r = np.concatenate([np.asarray(r10[0]), np.asarray(r20[0])])
x_ref = np.linalg.solve(K.astype(np.float64), r.astype(np.float64))
fac = factor_invschur(Hd0, J0)
dz, dnu = solve_invschur(fac, r10, r20)
x = np.concatenate([np.asarray(dz[0]), np.asarray(dnu[0])])
rel = np.max(np.abs(x - x_ref)) / np.max(np.abs(x_ref))
print("invschur rel err vs f64 LU:", rel)
