"""Warm-started batched-solve throughput: one cold solve from the
bounds-midpoint guess, then a batch of solves from jittered copies of the
cold solution (the reference's guess_file warm-start pattern,
MocoDirectCollocationSolver.h:164, applied to a multistart sweep).

Usage: python scripts/bench_warmstart.py [B] [jitter] [mu_init]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from opensim_moco_tpu.examples import hanging_muscle_study
from opensim_moco_tpu.solver.ipm import IPMOptions, make_solver

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
jitter = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05
mu_init = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-2

study = hanging_muscle_study(25, ignore_tendon_compliance=True,
                             ignore_activation_dynamics=True)
tr = study.transcription()
nlp = tr.make_nlp()
z0 = tr.initial_guess(dtype=jnp.float32)
opts = IPMOptions(tol=3e-3, max_iter=150, bound_relax=1e-6,
                  mu_init=1e-1, acceptable_tol_factor=30.0,
                  acceptable_iter=10)
solve = make_solver(nlp, opts, scale_z0=z0)

# cold solve (compile + solve, untimed)
t0 = time.perf_counter()
cold = jax.block_until_ready(jax.jit(solve)(z0))
print(f"cold solve: {time.perf_counter()-t0:.1f}s (incl compile) "
      f"converged={bool(cold.converged)} it={int(cold.iterations)} "
      f"f={float(cold.f):.5f}", flush=True)

zstar = np.asarray(cold.z)
lb, ub = [np.asarray(a) for a in tr.bounds()]
width = np.where(np.isfinite(ub - lb), ub - lb, 1.0)
free = ~((lb == ub) & np.isfinite(lb))
rng = np.random.default_rng(0)
Z0 = np.tile(zstar, (B, 1)) + \
    rng.uniform(-jitter, jitter, (B, zstar.size)) * width * free
Z0 = jnp.asarray(np.clip(Z0, lb, ub), jnp.float32)

opts_w = IPMOptions(tol=3e-3, max_iter=150, bound_relax=1e-6,
                    mu_init=mu_init, acceptable_tol_factor=30.0,
                    acceptable_iter=10)
solve_w = make_solver(nlp, opts_w, scale_z0=z0)
batched = jax.jit(jax.vmap(solve_w))

res = jax.block_until_ready(batched(Z0))
reps = 2
t0 = time.perf_counter()
for _ in range(reps):
    res = jax.block_until_ready(batched(Z0))
dt = (time.perf_counter() - t0) / reps
conv, iters = jax.device_get((res.converged, res.iterations))
print(f"B={B} jitter={jitter} mu_init={mu_init}: {B/dt:.2f} solves/s "
      f"wall={dt:.3f}s conv={int(conv.sum())}/{B} "
      f"mean_it={iters.mean():.1f} max_it={iters.max()}", flush=True)
