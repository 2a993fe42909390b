"""A/B wall-clock experiments on the real bench workload.

Timing rule for this tunneled TPU runtime: sub-second timings via
block_until_ready are unreliable (it returns before remote compute
drains), so every measurement here is a multi-second whole-solve wall
clock around a host readback (device_get), which is trustworthy.

Usage: python scripts/bench_ab.py [variant ...]
Variants: lu chol maxls6 maxls3 noexact
"""
import sys
import time

import jax
import jax.numpy as jnp

from opensim_moco_tpu.examples import hanging_muscle_study
from opensim_moco_tpu.parallel import batch_guesses
from opensim_moco_tpu.solver.ipm import IPMOptions, make_kernel

B = 32

VARIANTS = {
    "lu": {},
    "chol": {"dense_factorization": "chol-schur"},
    "maxls6": {"max_ls": 6},
    "maxls3": {"max_ls": 3},
    "chol+maxls6": {"dense_factorization": "chol-schur", "max_ls": 6},
    "noexact": {"hessian_approximation": "objective-only"},
}


def run_variant(name, overrides):
    study = hanging_muscle_study(25, ignore_tendon_compliance=True,
                                 ignore_activation_dynamics=True)
    tr = study.transcription()
    nlp = tr.make_nlp()
    z0 = tr.initial_guess(dtype=jnp.float32)
    opts = IPMOptions(tol=3e-3, max_iter=150, bound_relax=1e-6,
                      mu_init=1e-1, acceptable_tol_factor=30.0,
                      acceptable_iter=10, **overrides)
    init_fn, body_fn, cond_fn, finalize_fn, _dbg = make_kernel(nlp, opts,
                                                         scale_z0=z0)
    Z0 = batch_guesses(tr, B, scale=0.05, seed=0).astype(jnp.float32)

    # fixed-iteration-count run: K body_fn steps regardless of convergence,
    # so wall/K is the true marginal per-iteration cost (no lane early-out)
    def fixed_iters(z0, K):
        def body(i, c):
            return body_fn(c)
        return jax.lax.fori_loop(0, K, body, init_fn(z0))

    @jax.jit
    def run_k(Z, K):
        out = jax.vmap(lambda z: fixed_iters(z, K))(Z)
        return jnp.sum(out.kkt), jnp.sum(out.z[:, 0])

    for K in (10, 40):
        t0 = time.perf_counter()
        s = jax.device_get(run_k(Z0, K))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        s = jax.device_get(run_k(Z0, K))
        dt = time.perf_counter() - t0
        print(f"{name:12s} K={K:3d}  first={tc:6.1f}s  steady={dt:6.2f}s",
              flush=True)
        if K == 10:
            t10 = dt
        else:
            per_iter = (dt - t10) / 30.0
            print(f"{name:12s} marginal per-iteration: "
                  f"{per_iter*1000:.1f} ms", flush=True)

    # full convergence run for solution-quality comparison
    def solve(z):
        out = jax.lax.while_loop(cond_fn, body_fn, init_fn(z))
        return finalize_fn(out)

    @jax.jit
    def run(Z):
        res = jax.vmap(solve)(Z)
        return (jnp.sum(res.converged), jnp.mean(
            res.iterations.astype(jnp.float32)),
            jnp.max(res.iterations), jnp.mean(res.f))

    t0 = time.perf_counter()
    n_ok, mean_it, max_it, mean_f = jax.device_get(run(Z0))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_ok, mean_it, max_it, mean_f = jax.device_get(run(Z0))
    dt = time.perf_counter() - t0
    print(f"{name:12s} solve: wall={dt:6.2f}s conv={int(n_ok)}/{B} "
          f"mean_it={float(mean_it):.1f} max_it={int(max_it)} "
          f"mean_f={float(mean_f):.5f} -> {B/dt:.2f} solves/s", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["lu", "chol"]
    for nm in names:
        run_variant(nm, VARIANTS[nm])
