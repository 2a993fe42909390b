"""Hanging-muscle full-dynamics robustness sweep on TPU: convergence and
throughput across IPM option variants (VERDICT r4 items 4 and weak-7).
Usage: python scripts/hanging_sweep.py [B] [variant1,variant2,...]
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
import dataclasses

import jax.numpy as jnp
import numpy as np

from opensim_moco_tpu.examples import hanging_muscle_study
from opensim_moco_tpu.parallel import batch_guesses
from opensim_moco_tpu.solver.ipm import IPMOptions, make_solver

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32

VARIANTS = {
    "base": {},
    "keps100": dict(kappa_eps=100.0),
    "refine1": dict(kkt_refine_iters=1),
    "cholschur": dict(dense_factorization="chol-schur"),
    "refine1chol": dict(kkt_refine_iters=1,
                        dense_factorization="chol-schur"),
    "keps100refine1": dict(kappa_eps=100.0, kkt_refine_iters=1),
}
which = sys.argv[2].split(",") if len(sys.argv) > 2 else list(VARIANTS)

study = hanging_muscle_study(25, ignore_tendon_compliance=False,
                             ignore_activation_dynamics=False,
                             tendon_dynamics_implicit=True)
tr = study.transcription()
nlp = tr.make_nlp()
z0 = tr.initial_guess(dtype=jnp.float32)
Z0 = batch_guesses(tr, B, scale=0.05, seed=0).astype(jnp.float32)
base = IPMOptions(tol=3e-3, max_iter=200, bound_relax=1e-6, mu_init=1e-2,
                  acceptable_tol_factor=30.0, acceptable_iter=10,
                  max_rescues=100)
for name in which:
    opts = dataclasses.replace(base, **VARIANTS[name])
    solve = make_solver(nlp, opts, scale_z0=z0)
    batched = jax.jit(jax.vmap(solve))
    res = batched(Z0)
    res.z.block_until_ready()
    t0 = time.perf_counter()
    res = batched(Z0)
    res.z.block_until_ready()
    dt = time.perf_counter() - t0
    conv = int(jnp.sum(res.converged))
    strict = int(jnp.sum(res.converged & (res.kkt_error <= opts.tol)))
    mit = float(jnp.mean(res.iterations.astype(jnp.float32)))
    print(f"{name:16s} conv={conv}/{B} strict={strict}/{B} "
          f"mean_it={mit:6.1f} wall={dt:6.2f}s solves/s={B/dt:6.2f}",
          flush=True)
