"""Ad-hoc TPU bench sweeps for the hanging-muscle batched-solve benchmark.

Usage: python scripts/bench_experiments.py [kkt] [batch] [max_ls]
"""

import sys
import time

import jax
import jax.numpy as jnp

from opensim_moco_tpu.examples import hanging_muscle_study
from opensim_moco_tpu.parallel import batch_guesses
from opensim_moco_tpu.solver.ipm import IPMOptions, make_solver


def run(kkt="auto", B=32, max_ls=12):
    study = hanging_muscle_study(25, ignore_tendon_compliance=True,
                                 ignore_activation_dynamics=True)
    tr = study.transcription()
    nlp = tr.make_nlp()
    z0 = tr.initial_guess(dtype=jnp.float32)
    opts = IPMOptions(tol=3e-3, max_iter=150, bound_relax=1e-6,
                      mu_init=1e-1, acceptable_tol_factor=30.0,
                      acceptable_iter=10, kkt=kkt, max_ls=max_ls)
    solve = make_solver(nlp, opts, scale_z0=z0)
    batched = jax.jit(jax.vmap(solve))
    Z0 = batch_guesses(tr, B, scale=0.05, seed=0).astype(jnp.float32)

    @jax.jit
    def runfn(Z):
        res = batched(Z)
        return res.z[:, 1], jnp.sum(res.converged), jnp.mean(
            res.iterations.astype(jnp.float32)), jnp.max(res.iterations)

    t0 = time.perf_counter()
    tfs, n_ok, mean_it, max_it = runfn(Z0)
    tfs.block_until_ready()
    compile_s = time.perf_counter() - t0

    reps = 2
    start = time.perf_counter()
    for _ in range(reps):
        tfs, n_ok, mean_it, max_it = runfn(Z0)
        tfs.block_until_ready()
    dt = (time.perf_counter() - start) / reps
    n_ok_h, mean_it_h, max_it_h = jax.device_get((n_ok, mean_it, max_it))
    print(f"kkt={kkt} B={B} max_ls={max_ls}: {B/dt:.2f} solves/s "
          f"wall={dt:.3f}s compile={compile_s:.1f}s conv={int(n_ok_h)}/{B} "
          f"mean_it={float(mean_it_h):.1f} max_it={int(max_it_h)}",
          flush=True)


if __name__ == "__main__":
    kkt = sys.argv[1] if len(sys.argv) > 1 else "auto"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    max_ls = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    run(kkt, B, max_ls)
