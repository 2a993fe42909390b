"""Diagnose non-converged lanes in the bench batch: per-lane final KKT
error, iteration count, and best-KKT. Run on TPU (f32) or CPU (x64)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from opensim_moco_tpu.examples import hanging_muscle_study
from opensim_moco_tpu.parallel import batch_guesses
from opensim_moco_tpu.solver.ipm import IPMOptions, make_solver

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
max_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 150

study = hanging_muscle_study(25, ignore_tendon_compliance=True,
                             ignore_activation_dynamics=True)
tr = study.transcription()
nlp = tr.make_nlp()
dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
z0 = tr.initial_guess(dtype=dtype)
opts = IPMOptions(tol=3e-3, max_iter=max_iter, bound_relax=1e-6,
                  mu_init=1e-1, acceptable_tol_factor=30.0,
                  acceptable_iter=10)
solve = make_solver(nlp, opts, scale_z0=z0)
batched = jax.jit(jax.vmap(solve))
Z0 = batch_guesses(tr, B, scale=0.05, seed=0).astype(dtype)

t0 = time.perf_counter()
res = jax.block_until_ready(batched(Z0))
print(f"wall {time.perf_counter()-t0:.1f}s", flush=True)
conv, kkt, iters, f = jax.device_get((res.converged, res.kkt_error,
                                      res.iterations, res.f))
print(f"converged {int(conv.sum())}/{B} mean_it={iters.mean():.1f} "
      f"max_it={iters.max()}")
bad = np.nonzero(~conv)[0]
print("lane  iters  kkt_err     f")
for i in bad[:20]:
    print(f"{i:4d}  {iters[i]:5d}  {kkt[i]:.3e}  {f[i]:.6f}")
ok = conv.sum() > 0
if ok:
    fs = f[conv]
    print(f"converged objective range: [{fs.min():.6f}, {fs.max():.6f}]")
