"""Per-lane iteration distribution for the bench gait2d lane on TPU.

In a vmapped while_loop solve, wall-clock is set by the MAX lane
iterations, not the mean — this script shows the tail and tests whether
capping max_iter at just above the converged tail cuts wall time.

Usage: python scripts/gait2d_lane_dist.py [max_iter1,max_iter2,...]
"""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
import jax.numpy as jnp
import numpy as np

from opensim_moco_tpu.examples import gait2d_tracking_study
from opensim_moco_tpu.solver.ipm import IPMOptions, make_solver

maxits = [int(x) for x in sys.argv[1].split(",")] if len(sys.argv) > 1 \
    else [250]

study, guess = gait2d_tracking_study(num_mesh_intervals=15, tol=1e-3)
tr = study.transcription()
nlp = tr.make_nlp()
z0 = np.asarray(guess, dtype=np.float32)
B = 8
rng = np.random.default_rng(0)
Z0 = jnp.asarray(np.stack([z0] + [z0 + 0.005 * rng.standard_normal(
    z0.shape).astype(np.float32) for _ in range(B - 1)]))
Zw = Z0 + jnp.float32(1e-6)

for mi in maxits:
    opts = IPMOptions(tol=1e-4, max_iter=mi, mu_init=1e-2, max_rescues=100,
                      kappa_eps=100.0,
                      acceptable_tol_factor=30.0, acceptable_iter=5,
                      max_ls=6,
                      hessian_approximation="objective-only")
    batched = jax.jit(jax.vmap(make_solver(nlp, opts, scale_z0=z0)))
    batched(Zw).z.block_until_ready()
    t0 = time.perf_counter()
    res = batched(Z0)
    res.z.block_until_ready()
    dt = time.perf_counter() - t0
    it = np.asarray(jax.device_get(res.iterations))
    conv = np.asarray(jax.device_get(res.converged))
    kkt = np.asarray(jax.device_get(res.kkt_error))
    print(f"max_iter={mi}: wall={dt:6.2f}s solves/s={B/dt:6.4f} "
          f"conv={int(conv.sum())}/{B} iters={sorted(it.tolist())} "
          f"kkt_max={kkt.max():.2e}", flush=True)
