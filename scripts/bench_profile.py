"""Per-component timing of one IPM iteration's pieces at bench shapes.

Times 50 iterations of each component in a fori_loop, batched B=32,
to localize where the 58 ms/iteration goes.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from opensim_moco_tpu.examples import hanging_muscle_study
from opensim_moco_tpu.parallel import batch_guesses
from opensim_moco_tpu.solver.kkt import CompiledStructure
from opensim_moco_tpu.solver.structured import (
    BlockDerivatives, assemble_kkt_blocks, btb_factor, btb_solve,
    dense_H_from_blocks, dense_J_from_blocks)

B = 32
ITERS = 50


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    dt = time.perf_counter() - t0
    print(f"{name:40s} {dt/ITERS*1000:8.2f} ms/iter (x{ITERS})", flush=True)
    return out


def main():
    study = hanging_muscle_study(25, ignore_tendon_compliance=True,
                                 ignore_activation_dynamics=True)
    tr = study.transcription()
    nlp = tr.make_nlp()
    st = nlp.structure
    cs = CompiledStructure(st.var_blocks, st.con_blocks, st.border_vars,
                           st.border_cons, nlp.n, nlp.m)
    bd = BlockDerivatives(cs, nlp.constraints, nlp.objective)
    n, m = nlp.n, nlp.m
    print(f"n={n} m={m} N={cs.N} nv={cs.nv} nc={cs.nc}")
    Z = batch_guesses(tr, B, scale=0.05, seed=0).astype(jnp.float32)
    NU = jnp.ones((B, m), jnp.float32)

    c_fn = nlp.constraints
    f_fn = nlp.objective
    lag_grad = jax.grad(lambda z, nu: f_fn(z) + c_fn(z) @ nu, argnums=0)

    def loop(body):
        @jax.jit
        def run(Z):
            def step(i, acc):
                return acc + body(Z + 1e-6 * i, i)
            return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.float32))
        return run

    # 1. constraint eval (one c_fn over the batch)
    timeit("c_fn x1", loop(lambda Z, i: jnp.sum(jax.vmap(c_fn)(Z))), Z)

    # 2. grad f
    timeit("grad_f", loop(lambda Z, i: jnp.sum(jax.vmap(jax.grad(f_fn))(Z))),
           Z)

    # 3. compressed Jacobian blocks
    def jacb(Z, i):
        jb = jax.vmap(bd.jac_blocks)(Z)
        return jnp.sum(jb["Jcv"])
    timeit("jac_blocks (compressed)", loop(jacb), Z)

    # 4. compressed Hessian blocks
    def hessb(Z, i):
        hb = jax.vmap(lambda z: bd.hess_blocks(lag_grad, z, NU[0]))(Z)
        return jnp.sum(hb["Hvv"])
    timeit("hess_blocks (compressed)", loop(hessb), Z)

    # 5. dense jacfwd (old path)
    timeit("jacfwd dense (old)",
           loop(lambda Z, i: jnp.sum(jax.vmap(jax.jacfwd(c_fn))(Z))), Z)

    # 6. dense hessian (old path)
    timeit("hess dense (old)",
           loop(lambda Z, i: jnp.sum(jax.vmap(
               lambda z: jax.jacfwd(lag_grad)(z, NU[0]))(Z))), Z)

    # 7. KKT assemble + dense LU factor + 3 solves
    from jax.scipy.linalg import lu_factor, lu_solve

    def dense_kkt(Z, i):
        def one(z):
            jb = bd.jac_blocks(z)
            hb = bd.hess_blocks(lag_grad, z, NU[0])
            J = dense_J_from_blocks(jb, cs)
            H = dense_H_from_blocks(hb, cs)
            K = jnp.block([[H + jnp.eye(n, dtype=z.dtype), J.T],
                           [J, -1e-8 * jnp.eye(m, dtype=z.dtype)]])
            fac = lu_factor(K)
            r = jnp.concatenate([z, jnp.ones(m, z.dtype)])
            s = lu_solve(fac, r) + lu_solve(fac, 2 * r) + lu_solve(fac, 3 * r)
            return jnp.sum(s)
        return jnp.sum(jax.vmap(one)(Z))
    timeit("derivs + dense LU + 3 solves", loop(dense_kkt), Z)

    # 8. LU only (random fixed K)
    rng = np.random.default_rng(0)
    K0 = jnp.asarray(rng.standard_normal((B, n + m, n + m)), jnp.float32) + \
        10.0 * jnp.eye(n + m, dtype=jnp.float32)

    def lu_only(Z, i):
        fac = lu_factor(K0 + 1e-6 * i)
        r = jnp.ones((B, n + m), jnp.float32)
        s = lu_solve(fac, r) + lu_solve(fac, 2 * r) + lu_solve(fac, 3 * r)
        return jnp.sum(s)
    timeit("dense LU factor + 3 solves only", loop(lu_only), Z)

    # 9. BTB factor + 3 solves
    def btb(Z, i):
        def one(z):
            jb = bd.jac_blocks(z)
            hb = bd.hess_blocks(lag_grad, z, NU[0])
            D, L, Bb, Cb = assemble_kkt_blocks(
                hb, jb, jnp.ones(n, z.dtype), 1.0, 1e-8, cs)
            fac = btb_factor(D, L, Bb, Cb)
            from opensim_moco_tpu.solver.structured import pack_rhs
            rT, rC = pack_rhs(z, jnp.ones(m, z.dtype), None, cs)
            x1, w1 = btb_solve(fac, rT, rC)
            x2, w2 = btb_solve(fac, 2 * rT, 2 * rC)
            return jnp.sum(x1) + jnp.sum(x2)
        return jnp.sum(jax.vmap(one)(Z))
    timeit("derivs + BTB factor + 2 solves", loop(btb), Z)

    # 10. line-search candidates (13 c_fn + phi evals)
    def ls(Z, i):
        def one(z):
            alphas = 0.5 ** jnp.arange(1, 14, dtype=z.dtype)
            vals = jax.vmap(lambda a: jnp.sum(jnp.abs(c_fn(z * a))) +
                            f_fn(z * a))(alphas)
            return jnp.sum(vals)
        return jnp.sum(jax.vmap(one)(Z))
    timeit("13 line-search c+f evals", loop(ls), Z)


if __name__ == "__main__":
    main()
