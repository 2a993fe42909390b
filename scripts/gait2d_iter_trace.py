"""Per-iteration trace of the gait2d MocoTrack bench lane: where do the
221 mean IPM iterations go? Logs KKT error, mu, step, regularization,
rescue count each iteration. Run on TPU (bench config) or CPU."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from opensim_moco_tpu.examples import gait2d_tracking_study
from opensim_moco_tpu.solver.ipm import IPMOptions, make_kernel

mesh = int(sys.argv[1]) if len(sys.argv) > 1 else 15
max_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 250
refine = int(sys.argv[3]) if len(sys.argv) > 3 else 0

study, guess = gait2d_tracking_study(num_mesh_intervals=mesh, tol=1e-3)
tr = study.transcription()
nlp = tr.make_nlp()
dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
z0 = np.asarray(guess, dtype=dtype)
opts = IPMOptions(tol=1e-4, max_iter=max_iter, mu_init=1e-2, max_rescues=100,
                  acceptable_tol_factor=30.0, acceptable_iter=10,
                  kkt_refine_iters=refine,
                  hessian_approximation="objective-only")
init_fn, body_fn, cond_fn, finalize_fn, _dbg = make_kernel(nlp, opts, scale_z0=z0)
body = jax.jit(body_fn)
carry = jax.jit(init_fn)(jnp.asarray(z0))
print(f"n={nlp.n} m={nlp.m} dtype={dtype.__name__}")
t0 = time.perf_counter()
prev_mu = None
for it in range(max_iter):
    carry = body(carry)
    e0 = float(carry.kkt); mu = float(carry.mu)
    al = float(carry.alpha_last); dl = float(carry.delta_last)
    rc = int(carry.rescue_count); ac = int(carry.acceptable_count)
    conv = bool(carry.converged)
    mark = " MU" if prev_mu is not None and mu != prev_mu else ""
    prev_mu = mu
    if it < 40 or it % 5 == 0 or mark or conv:
        print(f"it={it:3d} kkt={e0:.3e} mu={mu:.2e} alpha={al:.2e} "
              f"delta={dl:.2e} resc={rc} acc={ac}{mark}"
              f"{' CONVERGED' if conv else ''}")
    if conv:
        break
dt = time.perf_counter() - t0
res = finalize_fn(carry)
print(f"done: it={int(res.iterations)} kkt={float(res.kkt_error):.3e} "
      f"f={float(res.f):.6f} conv={bool(res.converged)} wall={dt:.1f}s "
      f"({dt/max(1,int(res.iterations)):.3f}s/it)")
