"""Time the REAL IPM body_fn at bench shapes, batched B=32, chained.

Variants: default opts | max_reg=1 | max_ls=6 | max_reg=1+max_ls=6.
Localizes whether the ~58 ms/iter bench cost is the regularization
retry loop (each retry = one more dense factorization)."""

import time

import jax
import jax.numpy as jnp

from opensim_moco_tpu.examples import hanging_muscle_study
from opensim_moco_tpu.parallel import batch_guesses
from opensim_moco_tpu.solver.ipm import IPMOptions, make_kernel

B = 32
ITERS = 20

study = hanging_muscle_study(25, ignore_tendon_compliance=True,
                             ignore_activation_dynamics=True)
tr = study.transcription()
nlp = tr.make_nlp()
z0 = tr.initial_guess(dtype=jnp.float32)
Z0 = batch_guesses(tr, B, scale=0.05, seed=0).astype(jnp.float32)


def run(tag, **kw):
    opts = IPMOptions(tol=3e-3, max_iter=150, bound_relax=1e-6,
                      mu_init=1e-1, acceptable_tol_factor=30.0,
                      acceptable_iter=10, **kw)
    init_fn, body_fn, cond_fn, fin, _dbg = make_kernel(nlp, opts, scale_z0=z0)

    @jax.jit
    def chain(Z):
        c0 = jax.vmap(init_fn)(Z)

        def step(i, c):
            return jax.vmap(body_fn)(c)
        c = jax.lax.fori_loop(0, ITERS, step, c0)
        return c.kkt, c.it

    kkt, it = jax.block_until_ready(chain(Z0))
    t0 = time.perf_counter()
    kkt, it = jax.block_until_ready(chain(Z0))
    dt = time.perf_counter() - t0
    print(f"{tag:28s} {dt/ITERS*1000:8.2f} ms/iter  "
          f"median_kkt={float(jnp.median(kkt)):.3e}", flush=True)


run("default (reg12, ls12)")
run("max_reg=1", max_reg=1)
run("max_ls=6", max_ls=6)
run("reg1+ls6", max_reg=1, max_ls=6)
