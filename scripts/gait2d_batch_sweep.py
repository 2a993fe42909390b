"""Batch-scaling curve for the north-star gait2d MocoTrack lane on TPU:
solves/s/chip vs batch size (VERDICT r4 lever (a)). Also reports
iteration counts so warm-start/mu changes are visible.

Usage: python scripts/gait2d_batch_sweep.py [mesh] [B1,B2,...]
"""

import os
import sys
import time

import os as _os
import jax
if _os.environ.get("FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
import jax.numpy as jnp
import numpy as np

from opensim_moco_tpu.examples import gait2d_tracking_study
from opensim_moco_tpu.solver.ipm import IPMOptions, make_solver

mesh = int(sys.argv[1]) if len(sys.argv) > 1 else 15
Bs = [int(b) for b in sys.argv[2].split(",")] if len(sys.argv) > 2 \
    else [4, 8, 16, 32]

study, guess = gait2d_tracking_study(num_mesh_intervals=mesh, tol=1e-3)
tr = study.transcription()
nlp = tr.make_nlp()
z0 = np.asarray(guess, dtype=np.float32)
opts = IPMOptions(tol=1e-4, max_iter=250, mu_init=1e-2, max_rescues=100,
                  acceptable_tol_factor=30.0, acceptable_iter=10,
                  hessian_approximation="objective-only")
solve = make_solver(nlp, opts, scale_z0=z0)
batched = jax.jit(jax.vmap(solve))
rng = np.random.default_rng(0)

for B in Bs:
    Z0 = np.stack([z0] + [z0 + 0.005 * rng.standard_normal(
        z0.shape).astype(np.float32) for _ in range(B - 1)])
    Z0 = jnp.asarray(Z0)
    # warm up on a DIFFERENT batch: the tunneled runtime memoizes
    # identical (executable, input) pairs, so timing a repeat of the
    # warm-up input reads ~0 s
    Zw = Z0 + jnp.float32(1e-6)
    batched(Zw).z.block_until_ready()
    t0 = time.perf_counter()
    res = batched(Z0)
    res.z.block_until_ready()
    dt = time.perf_counter() - t0
    conv = int(jnp.sum(res.converged))
    strict = int(jnp.sum(res.converged & (res.kkt_error <= opts.tol)))
    mit = float(jnp.mean(res.iterations.astype(jnp.float32)))
    print(f"B={B:3d} wall={dt:7.2f}s solves/s={B/dt:7.3f} "
          f"conv={conv}/{B} strict={strict}/{B} mean_it={mit:.1f}",
          flush=True)
