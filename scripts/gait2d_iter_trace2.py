"""gait2d trace with error decomposition (dual/primal/comp, dual norms)."""
import sys
import time

import os as _os
import jax
if _os.environ.get("FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  _os.path.join(_os.path.dirname(_os.path.dirname(
                      _os.path.abspath(__file__))), ".jax_cache"))
import jax.numpy as jnp
import numpy as np

from opensim_moco_tpu.examples import gait2d_tracking_study
from opensim_moco_tpu.solver.ipm import IPMOptions, make_kernel

mesh = int(sys.argv[1]) if len(sys.argv) > 1 else 15
max_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 120
import dataclasses
extra = {}
for kv in sys.argv[3:]:
    k, v = kv.split("=")
    extra[k] = type(getattr(IPMOptions(), k))(v) if not isinstance(
        getattr(IPMOptions(), k), str) else v

study, guess = gait2d_tracking_study(num_mesh_intervals=mesh, tol=1e-3)
tr = study.transcription()
nlp = tr.make_nlp()
dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
z0 = np.asarray(guess, dtype=dtype)
opts = IPMOptions(tol=1e-4, max_iter=max_iter, mu_init=1e-2, max_rescues=100,
                  acceptable_tol_factor=30.0, acceptable_iter=10,
                  hessian_approximation="objective-only", **extra)
print("extra:", extra)
init_fn, body_fn, cond_fn, fin, dbg = make_kernel(nlp, opts, scale_z0=z0)
body = jax.jit(body_fn)
dbgj = jax.jit(dbg)
carry = jax.jit(init_fn)(jnp.asarray(z0))
d = {k: float(v) for k, v in dbgj(carry).items()}
print(f"INIT dual={d['dual']:.2e} pri={d['primal']:.2e} comp={d['comp']:.2e} "
      f"sd={d['sd']:.1e} nu={d['nu_inf']:.1e}")
t0 = time.perf_counter()
for it in range(max_iter):
    carry = body(carry)
    if it < 20 or it % 5 == 0 or bool(carry.converged):
        d = {k: float(v) for k, v in dbgj(carry).items()}
        print(f"it={it:3d} kkt={float(carry.kkt):.3e} mu={float(carry.mu):.2e} "
              f"al={float(carry.alpha_last):.1e} dual={d['dual']:.2e} "
              f"pri={d['primal']:.2e} comp={d['comp']:.2e} sd={d['sd']:.1e} "
              f"nu={d['nu_inf']:.1e} wL={d['wL_inf']:.1e} "
              f"mindl={d['min_dl']:.1e} mindu={d['min_du']:.1e}", flush=True)
    if bool(carry.converged):
        print(f"CONVERGED at {it}"); break
print(f"wall={time.perf_counter()-t0:.1f}s")
