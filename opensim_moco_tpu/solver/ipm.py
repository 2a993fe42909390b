"""Batched primal-dual interior-point NLP solver in pure JAX.

This replaces the reference's L1 layer (IPOPT + MUMPS behind CasADi /
tropter bridges, reference CasOCTranscription.cpp:677-692 and
tropter/optimization/IPOPTSolver.cpp:32-89) with a jit-able, vmap-able,
shard_map-able solver:

* exact gradients / constraint Jacobians / Lagrangian Hessians via JAX
  autodiff on the fused transcription graph — this deletes the reference's
  entire finite-difference + sparsity-detection + ADOL-C/ColPack machinery;
* the IPOPT algorithmic skeleton (monotone Fiacco-McCormick barrier
  schedule, fraction-to-boundary rule, primal-dual bound duals with
  kappa-Sigma safeguarding, inertia-free regularization retries, l1 merit
  line search) re-expressed as a single `lax.while_loop` so the entire
  solve — all iterations — is ONE XLA computation;
* dense KKT factorization by default (right for Moco-scale problems batched
  on the MXU); structured block-banded kernels plug in behind the same
  interface (see solver/kkt.py).

The whole solver runs under `vmap`: thousands of trajectory optimizations
solve simultaneously per chip, each lane with its own convergence flag.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .nlp import NLP


@dataclasses.dataclass(frozen=True)
class IPMOptions:
    tol: float = 1e-6
    max_iter: int = 500
    mu_init: float = 1e-1
    mu_min_factor: float = 1.0 / 11.0  # mu_min = tol * factor
    kappa_eps: float = 10.0
    kappa_mu: float = 0.2
    theta_mu: float = 1.5
    tau_min: float = 0.99
    kappa_sigma: float = 1e10
    bound_relax: float = 1e-8
    bound_push: float = 1e-2
    delta_w_init: float = 1e-8
    delta_w_max: float = 1e10
    max_ls: int = 30  # line-search halvings
    max_reg: int = 12  # regularization retries
    armijo_eta: float = 1e-4
    max_soc: int = 0  # second-order corrections (not yet)


class IPMResult(NamedTuple):
    z: jnp.ndarray
    nu: jnp.ndarray
    f: jnp.ndarray
    kkt_error: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray


def _inf_norm(x):
    return jnp.max(jnp.abs(x)) if x.size else jnp.zeros(())


def make_solver(nlp: NLP, options: IPMOptions = IPMOptions()) -> Callable:
    """Build a pure solve function ``z0 -> IPMResult`` for a fixed NLP.

    The returned function contains no Python-level control flow, so it can be
    jitted, vmapped (batch of initial guesses / parameterized problems via
    closure), and pjit-sharded.

    Variables with equal lower/upper bounds (pinned times/initial states in
    Moco problems) are eliminated from the optimization space entirely
    (IPOPT's fixed_variable_treatment=make_parameter), which keeps the
    fraction-to-boundary rule from collapsing the step size.
    """
    import numpy as np

    lb_np = np.asarray(nlp.lb, dtype=np.float64)
    ub_np = np.asarray(nlp.ub, dtype=np.float64)
    fixed_mask = np.isfinite(lb_np) & (lb_np == ub_np)
    free_idx = np.nonzero(~fixed_mask)[0]
    n_full = nlp.n
    has_fixed = bool(fixed_mask.any())
    if has_fixed:
        fixed_template = np.where(fixed_mask, lb_np, 0.0)
        free_idx_j = jnp.asarray(free_idx)

        def to_full(zr):
            base = jnp.asarray(fixed_template, dtype=zr.dtype)
            return base.at[free_idx_j].set(zr)

        full_obj = nlp.objective
        full_con = nlp.constraints
        nlp = NLP(n=len(free_idx), m=nlp.m,
                  objective=lambda zr: full_obj(to_full(zr)),
                  constraints=lambda zr: full_con(to_full(zr)),
                  lb=jnp.asarray(lb_np[free_idx]),
                  ub=jnp.asarray(ub_np[free_idx]))
    f_fn = nlp.objective
    c_fn = nlp.constraints
    grad_f = jax.grad(f_fn)
    jac_c = jax.jacfwd(c_fn)

    def lagrangian(z, nu):
        c = c_fn(z)
        return f_fn(z) + (c @ nu if nlp.m else 0.0)

    hess_L = jax.jacfwd(jax.grad(lagrangian, argnums=0), argnums=0)

    opt = options
    n, m = nlp.n, nlp.m

    def solve(z0_full):
        if has_fixed:
            z0 = z0_full[free_idx_j]
        else:
            z0 = z0_full
        dtype = z0.dtype
        l = jnp.asarray(nlp.lb, dtype)
        u = jnp.asarray(nlp.ub, dtype)
        has_l = jnp.isfinite(l)
        has_u = jnp.isfinite(u)
        # IPOPT-style bound relaxation so equal lower/upper bounds (used by
        # Moco problems to pin initial/final states) keep a nonempty interior.
        l = jnp.where(has_l, l - opt.bound_relax * jnp.maximum(1.0, jnp.abs(l)),
                      l)
        u = jnp.where(has_u, u + opt.bound_relax * jnp.maximum(1.0, jnp.abs(u)),
                      u)
        # push the start point into the strict interior (IPOPT kappa_1/2)
        both = has_l & has_u
        width = jnp.where(both, u - l, jnp.inf)
        pl = jnp.minimum(opt.bound_push * jnp.maximum(1.0, jnp.abs(l)),
                         0.25 * width)
        pu = jnp.minimum(opt.bound_push * jnp.maximum(1.0, jnp.abs(u)),
                         0.25 * width)
        z = jnp.clip(z0, jnp.where(has_l, l + pl, -jnp.inf),
                     jnp.where(has_u, u - pu, jnp.inf))
        nu = jnp.zeros((m,), dtype)
        mu0 = jnp.asarray(opt.mu_init, dtype)

        def dl_du(z):
            dl = jnp.where(has_l, z - l, 1.0)
            du = jnp.where(has_u, u - z, 1.0)
            return dl, du

        dl, du = dl_du(z)
        wL = jnp.where(has_l, mu0 / dl, 0.0)
        wU = jnp.where(has_u, mu0 / du, 0.0)

        mu_min = jnp.asarray(opt.tol * opt.mu_min_factor, dtype)

        def barrier_phi(z, mu, rho):
            """l1-merit: f - mu sum(log dl) - mu sum(log du) + rho ||c||_1.
            Returns +inf for non-interior / non-finite trial points."""
            dl, du = dl_du(z)
            interior = jnp.all(dl > 0) & jnp.all(du > 0)
            logs = (jnp.sum(jnp.where(has_l, jnp.log(jnp.where(dl > 0, dl, 1.0)),
                                      0.0)) +
                    jnp.sum(jnp.where(has_u, jnp.log(jnp.where(du > 0, du, 1.0)),
                                      0.0)))
            c = c_fn(z)
            val = f_fn(z) - mu * logs + rho * jnp.sum(jnp.abs(c))
            bad = ~interior | ~jnp.isfinite(val)
            return jnp.where(bad, jnp.asarray(jnp.inf, dtype), val)

        class Carry(NamedTuple):
            z: jnp.ndarray
            nu: jnp.ndarray
            wL: jnp.ndarray
            wU: jnp.ndarray
            mu: jnp.ndarray
            it: jnp.ndarray
            converged: jnp.ndarray
            kkt: jnp.ndarray
            delta_w_last: jnp.ndarray

        def body(carry: Carry) -> Carry:
            z, nu, wL, wU, mu = carry.z, carry.nu, carry.wL, carry.wU, carry.mu
            g = grad_f(z)
            J = jac_c(z)
            cz = c_fn(z)
            W = hess_L(z, nu)
            dl, du = dl_du(z)
            SigL = jnp.where(has_l, wL / dl, 0.0)
            SigU = jnp.where(has_u, wU / du, 0.0)

            Jt_nu = J.T @ nu if m else jnp.zeros((n,), dtype)
            rd = g + Jt_nu - jnp.where(has_l, wL, 0.0) + jnp.where(has_u, wU,
                                                                   0.0)
            # IPOPT scaling factors s_d, s_c
            smax = 100.0
            ssum = jnp.sum(jnp.abs(nu)) + jnp.sum(jnp.abs(wL)) + jnp.sum(
                jnp.abs(wU))
            sd = jnp.maximum(smax, ssum / (m + 2 * n)) / smax
            sc = jnp.maximum(smax,
                             (jnp.sum(jnp.abs(wL)) + jnp.sum(jnp.abs(wU))) /
                             jnp.maximum(1, 2 * n)) / smax

            def err(mu_val):
                compL = jnp.where(has_l, dl * wL - mu_val, 0.0)
                compU = jnp.where(has_u, du * wU - mu_val, 0.0)
                return jnp.maximum(
                    _inf_norm(rd) / sd,
                    jnp.maximum(_inf_norm(cz),
                                jnp.maximum(_inf_norm(compL),
                                            _inf_norm(compU)) / sc))

            e0 = err(jnp.zeros((), dtype))
            converged = e0 <= opt.tol
            e_mu = err(mu)
            mu_new = jnp.where(
                e_mu <= opt.kappa_eps * mu,
                jnp.maximum(mu_min,
                            jnp.minimum(opt.kappa_mu * mu, mu ** opt.theta_mu)),
                mu)

            # condensed primal-dual system rhs
            rhs1 = -(g + Jt_nu) + jnp.where(has_l, mu_new / dl, 0.0) - \
                jnp.where(has_u, mu_new / du, 0.0)
            rhs2 = -cz
            gphi = g - jnp.where(has_l, mu_new / dl, 0.0) + \
                jnp.where(has_u, mu_new / du, 0.0)

            H = W + jnp.diag(SigL + SigU)
            wscale = jnp.maximum(1.0, _inf_norm(jnp.diagonal(H)))

            def kkt_solve(delta_w):
                delta_c = 1e-8 * wscale
                K = jnp.block([
                    [H + delta_w * jnp.eye(n, dtype=dtype), J.T],
                    [J, -delta_c * jnp.eye(m, dtype=dtype)],
                ]) if m else H + delta_w * jnp.eye(n, dtype=dtype)
                rhs = jnp.concatenate([rhs1, rhs2]) if m else rhs1
                sol = jnp.linalg.solve(K, rhs)
                return sol[:n], sol[n:]

            # inertia-free regularization: retry with growing delta_w until
            # the direction is finite and gives a descent direction for the
            # merit function (IPOPT algorithm IC, simplified)
            theta = 0.5
            norm_c1 = jnp.sum(jnp.abs(cz))

            def try_delta(state):
                delta, _, _, _, _, tries = state
                dz, dnu = kkt_solve(delta)
                gTd = gphi @ dz
                rho_needed = gTd / jnp.maximum((1 - theta) * norm_c1, 1e-10)
                rho = jnp.maximum(1.0, 1.5 * rho_needed)
                Dphi = gTd - rho * norm_c1
                ok = jnp.all(jnp.isfinite(dz)) & (Dphi < 0)
                return delta, dz, dnu, rho, ok, tries

            def reg_cond(state):
                delta, _, _, _, ok, tries = state
                return (~ok) & (tries < opt.max_reg)

            def reg_body(state):
                delta, dz, dnu, rho, ok, tries = state
                new_delta = jnp.where(tries == 0,
                                      opt.delta_w_init * wscale, delta * 100.0)
                d2, dz2, dnu2, rho2, ok2, _ = try_delta(
                    (new_delta, dz, dnu, rho, ok, tries))
                return (new_delta, dz2, dnu2, rho2, ok2, tries + 1)

            init = try_delta((jnp.zeros((), dtype), jnp.zeros((n,), dtype),
                              jnp.zeros((m,), dtype), jnp.ones((), dtype),
                              jnp.array(False), jnp.array(0)))
            delta, dz, dnu, rho, ok, _ = jax.lax.while_loop(
                reg_cond, reg_body, init)

            dwL = jnp.where(has_l, mu_new / dl - wL - SigL * dz, 0.0)
            dwU = jnp.where(has_u, mu_new / du - wU + SigU * dz, 0.0)

            # fraction-to-boundary step limits
            tau = jnp.maximum(opt.tau_min, 1.0 - mu_new)

            def max_step(val, dval, active):
                # largest alpha <= 1 with val + alpha dval >= (1 - tau) val
                safe = jnp.where(active & (dval < 0),
                                 -tau * val / jnp.where(dval < 0, dval, -1.0),
                                 jnp.inf)
                return jnp.minimum(1.0, jnp.min(safe) if safe.size else 1.0)

            alpha_pr_max = jnp.minimum(max_step(dl, dz, has_l),
                                       max_step(du, -dz, has_u))
            alpha_du = jnp.minimum(max_step(wL, dwL, has_l),
                                   max_step(wU, dwU, has_u))

            # Armijo backtracking on the l1 merit
            phi0 = barrier_phi(z, mu_new, rho)
            gTd = gphi @ dz
            Dphi = gTd - rho * norm_c1

            def ls_cond(state):
                alpha, done, tries = state
                return (~done) & (tries < opt.max_ls)

            def ls_body(state):
                alpha, done, tries = state
                phi_trial = barrier_phi(z + alpha * dz, mu_new, rho)
                accept = phi_trial <= phi0 + opt.armijo_eta * alpha * Dphi
                return (jnp.where(accept, alpha, alpha * 0.5), accept,
                        tries + 1)

            alpha, accepted, _ = jax.lax.while_loop(
                ls_cond, ls_body, (alpha_pr_max, jnp.array(False),
                                   jnp.array(0)))
            # if line search failed entirely, take a tiny safeguarded step
            alpha = jnp.where(accepted, alpha, alpha_pr_max * 2.0 ** (-opt.max_ls))

            z_new = z + alpha * dz
            nu_new = nu + alpha * dnu
            wL_new = wL + alpha_du * dwL
            wU_new = wU + alpha_du * dwU
            # kappa-Sigma safeguard keeps bound duals consistent with mu
            dl_n, du_n = dl_du(z_new)
            ks = opt.kappa_sigma
            wL_new = jnp.where(has_l,
                               jnp.clip(wL_new, mu_new / (ks * dl_n),
                                        ks * mu_new / dl_n), 0.0)
            wU_new = jnp.where(has_u,
                               jnp.clip(wU_new, mu_new / (ks * du_n),
                                        ks * mu_new / du_n), 0.0)

            # freeze state on converged lanes so vmapped batches are stable
            keep = converged
            z_new = jnp.where(keep, z, z_new)
            nu_new = jnp.where(keep, nu, nu_new)
            wL_new = jnp.where(keep, wL, wL_new)
            wU_new = jnp.where(keep, wU, wU_new)
            mu_out = jnp.where(keep, mu, mu_new)

            return Carry(z_new, nu_new, wL_new, wU_new, mu_out,
                         carry.it + jnp.where(keep, 0, 1), converged, e0,
                         delta)

        def cond(carry: Carry):
            return (~carry.converged) & (carry.it < opt.max_iter)

        init = Carry(z, nu, wL, wU, mu0, jnp.zeros((), jnp.int32),
                     jnp.array(False), jnp.asarray(jnp.inf, dtype),
                     jnp.zeros((), dtype))
        out = jax.lax.while_loop(cond, body, init)
        z_out = to_full(out.z) if has_fixed else out.z
        return IPMResult(z=z_out, nu=out.nu, f=f_fn(out.z),
                         kkt_error=out.kkt, iterations=out.it,
                         converged=out.converged)

    return solve
