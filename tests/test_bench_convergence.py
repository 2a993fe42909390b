"""Pin the bench batch's convergence behavior.

Round-3 regression: a solver tweak (max_rescues=4) silently dropped the
bench batch from 24/32 to 10/32 converged lanes and nothing failed. This
test pins the convergence rate and iteration budget of the bench problem
class in the bench's own precision (f32) so solver changes surface
immediately.
"""

import jax
import jax.numpy as jnp
import numpy as np


def test_bench_batch_convergence_rate():
    from opensim_moco_tpu.examples import hanging_muscle_study
    from opensim_moco_tpu.parallel import batch_guesses
    from opensim_moco_tpu.solver.ipm import IPMOptions, make_solver

    study = hanging_muscle_study(25, ignore_tendon_compliance=True,
                                 ignore_activation_dynamics=True)
    tr = study.transcription()
    nlp = tr.make_nlp()
    z0 = tr.initial_guess(dtype=jnp.float32)
    # bench.py lane settings (keep in sync)
    opts = IPMOptions(tol=3e-3, max_iter=150, bound_relax=1e-6,
                      mu_init=1e-2, kappa_eps=100.0,
                      acceptable_tol_factor=30.0,
                      acceptable_iter=10, max_rescues=100)
    solve = make_solver(nlp, opts, scale_z0=z0)
    B = 8
    Z0 = batch_guesses(tr, B, scale=0.05, seed=0).astype(jnp.float32)
    res = jax.jit(jax.vmap(solve))(Z0)
    conv = int(jnp.sum(res.converged))
    mean_it = float(jnp.mean(res.iterations.astype(jnp.float32)))
    assert conv >= 7, f"bench convergence regressed: {conv}/8"
    assert mean_it < 80, f"bench iteration count regressed: {mean_it}"
