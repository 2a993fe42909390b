"""KKT linear-solve strategy shootout at bench shapes, honest chained
fori_loop timing (B=32, n+m=382, f32):

  lu_factor only | lu_factor + combined 3-RHS solve | jnp.linalg.solve |
  jnp.linalg.inv + matmul solves | blocked recursive Schur inverse
  (pure batched matmuls + small base inverses).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import lu_factor, lu_solve

B, N = 32, 382
ITERS = 20
dtype = jnp.float32

rng = np.random.default_rng(0)
K0 = jnp.asarray(rng.standard_normal((B, N, N)), dtype) + \
    10.0 * jnp.eye(N, dtype=np.float32)
R0 = jnp.asarray(rng.standard_normal((B, N, 3)), dtype)


def chained(name, step_fn):
    @jax.jit
    def run(K, R):
        def step(i, carry):
            K, acc = carry
            s = step_fn(K, R + 1e-6 * acc[:, :, None] *
                        jnp.ones((1, 1, 3), dtype))
            K = K + 1e-9 * s[:, :, :1] @ s.transpose(0, 2, 1)[:, :1, :]
            return (K, s[:, :, 0])
        K, acc = jax.lax.fori_loop(0, ITERS, step,
                                   (K, jnp.zeros((B, N), dtype)))
        return jnp.sum(acc)

    out = jax.block_until_ready(run(K0, R0))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(K0, R0 + 1e-5))
    dt = time.perf_counter() - t0
    print(f"{name:36s} {dt/ITERS*1000:8.2f} ms/iter  sum={float(out):.4g}",
          flush=True)


def s_lu_factor_only(K, R):
    lu, piv = lu_factor(K)
    return lu[:, :, :3] + R * 0  # touch R so shapes line up


def s_lu_3rhs(K, R):
    fac = lu_factor(K)
    return lu_solve(fac, R)


def s_solve(K, R):
    return jnp.linalg.solve(K, R)


def s_inv_matmul(K, R):
    Ki = jnp.linalg.inv(K)
    return Ki @ R


def blocked_inv(K, base=48):
    s = K.shape[-1]
    if s <= base:
        return jnp.linalg.inv(K)
    h = s // 2
    A = K[:, :h, :h]
    Bb = K[:, :h, h:]
    C = K[:, h:, :h]
    D = K[:, h:, h:]
    Ai = blocked_inv(A, base)
    CAi = C @ Ai
    AiB = Ai @ Bb
    S = D - CAi @ Bb
    Si = blocked_inv(S, base)
    TL = Ai + AiB @ Si @ CAi
    TR = -AiB @ Si
    BL = -Si @ CAi
    top = jnp.concatenate([TL, TR], axis=2)
    bot = jnp.concatenate([BL, Si], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def s_blocked_inv(K, R):
    return blocked_inv(K) @ R


chained("lu_factor only", s_lu_factor_only)
chained("lu_factor + one 3-RHS solve", s_lu_3rhs)
chained("jnp.linalg.solve 3-RHS", s_solve)
chained("jnp.linalg.inv + matmul", s_inv_matmul)
chained("blocked recursive inv + matmul", s_blocked_inv)

# accuracy of blocked inverse vs lu on the quasi-definite-ish K0
x_lu = lu_solve(lu_factor(K0), R0)
x_bi = blocked_inv(K0) @ R0
rel = jnp.max(jnp.abs(x_lu - x_bi)) / jnp.max(jnp.abs(x_lu))
print("blocked-inv rel err vs LU:", float(rel))
