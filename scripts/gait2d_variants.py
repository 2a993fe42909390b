"""North-star lane option variants on TPU (B=4): does KKT refinement lower
the f32 floor (strict exits), and does a shorter acceptable window cut
tail iterations? Usage: python scripts/gait2d_variants.py v1,v2"""
import os as _os
import jax
if _os.environ.get("FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  _os.path.join(_os.path.dirname(_os.path.dirname(
                      _os.path.abspath(__file__))), ".jax_cache"))
import dataclasses
import sys
import time

import jax.numpy as jnp
import numpy as np

from opensim_moco_tpu.examples import gait2d_tracking_study
from opensim_moco_tpu.solver.ipm import IPMOptions, make_solver

VARIANTS = {
    "base": {},
    "refine1": dict(kkt_refine_iters=1),
    "acc5": dict(acceptable_iter=5),
    "refine1acc5": dict(kkt_refine_iters=1, acceptable_iter=5),
    "acc60": dict(acceptable_tol_factor=60.0),
    "ls6": dict(max_ls=6, acceptable_iter=5),
    "mu1e-3": dict(mu_init=1e-3, acceptable_iter=5),
    "ls6mu1e-3": dict(max_ls=6, mu_init=1e-3, acceptable_iter=5),
}
which = sys.argv[1].split(",") if len(sys.argv) > 1 else ["refine1", "acc5"]

study, guess = gait2d_tracking_study(num_mesh_intervals=15, tol=1e-3)
tr = study.transcription()
nlp = tr.make_nlp()
z0 = np.asarray(guess, dtype=np.float32)
B = 4
rng = np.random.default_rng(0)
Z0 = jnp.asarray(np.stack([z0] + [z0 + 0.005 * rng.standard_normal(
    z0.shape).astype(np.float32) for _ in range(B - 1)]))
Zw = Z0 + jnp.float32(1e-6)
base = IPMOptions(tol=1e-4, max_iter=250, mu_init=1e-2, max_rescues=100,
                  acceptable_tol_factor=30.0, acceptable_iter=10,
                  hessian_approximation="objective-only")
for name in which:
    opts = dataclasses.replace(base, **VARIANTS[name])
    batched = jax.jit(jax.vmap(make_solver(nlp, opts, scale_z0=z0)))
    batched(Zw).z.block_until_ready()
    t0 = time.perf_counter()
    res = batched(Z0)
    res.z.block_until_ready()
    dt = time.perf_counter() - t0
    conv = int(jnp.sum(res.converged))
    strict = int(jnp.sum(res.converged & (res.kkt_error <= opts.tol)))
    mit = float(jnp.mean(res.iterations.astype(jnp.float32)))
    kmin = float(jnp.min(res.kkt_error))
    print(f"{name:12s} conv={conv}/{B} strict={strict}/{B} "
          f"mean_it={mit:6.1f} min_kkt={kmin:.1e} wall={dt:6.2f}s "
          f"solves/s={B/dt:6.3f}", flush=True)
