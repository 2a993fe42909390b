"""Forward time-stepping simulation via lax.scan.

The reference generates "time-stepping" initial guesses and validates
trajectory-optimization solutions by forward integration
(simulateTrajectoryWithTimeStepping, reference MocoUtilities.cpp:431-480,
used by createGuessTimeStepping, MocoSolver.cpp:26). Here that is a
`lax.scan` RK4 over the same pure dynamics the transcription uses — the
forward-rollout <-> collocation duality on one dynamics function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rollout(model, params, t_grid, controls, y0, substeps: int = 10):
    """RK4-integrate the model under piecewise-linear controls.

    Parameters
    ----------
    model : finalized :class:`~opensim_moco_tpu.models.model.Model`
    params : model parameter pytree
    t_grid : (G,) times at which ``controls`` rows are defined
    controls : (G, nx) control table (linear interpolation in between)
    y0 : (ny,) initial state
    substeps : RK4 substeps per grid interval

    Returns (G, ny) states at the grid times. Kinematic-constraint forces
    are not applied (use on unconstrained models or with lam = 0).
    """
    t_grid = jnp.asarray(t_grid)
    controls = jnp.asarray(controls)
    y0 = jnp.asarray(y0)
    nlam = model.nphi

    def xfun(t):
        # piecewise-linear control interpolation inside the graph
        return jax.vmap(lambda col: jnp.interp(t, t_grid, col))(controls.T)

    def f(t, y):
        q, u, z = model.split_state(y)
        x = xfun(t)
        lam = jnp.zeros(nlam, dtype=y.dtype)
        return model.state_derivatives(params, t, q, u, z, x, lam)

    def step_interval(y, i):
        t0 = t_grid[i]
        t1 = t_grid[i + 1]
        h = (t1 - t0) / substeps

        def rk4(y, k):
            t = t0 + k * h
            k1 = f(t, y)
            k2 = f(t + 0.5 * h, y + 0.5 * h * k1)
            k3 = f(t + 0.5 * h, y + 0.5 * h * k2)
            k4 = f(t + h, y + h * k3)
            return y + h / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4), None

        y1, _ = jax.lax.scan(rk4, y, jnp.arange(substeps))
        return y1, y1

    _, ys = jax.lax.scan(step_interval, y0, jnp.arange(len(t_grid) - 1))
    return jnp.concatenate([y0[None], ys], axis=0)


def time_stepping_guess(transcription, controls=None, y0=None, t0=None,
                        tf=None):
    """Build a flat initial iterate by forward simulation
    (createGuessTimeStepping analogue, reference MocoSolver.cpp:26).

    Controls default to the bounds midpoint; y0 to the initial-bounds
    midpoint; times to their bounds midpoints.
    """
    tr = transcription
    rep = tr.rep
    mid = np.asarray(tr.initial_guess())
    t0v, tfv, Y, X, L, D, Gm, pcs, ecs, theta = tr.unpack(jnp.asarray(mid))
    t0v = float(t0v) if t0 is None else t0
    tfv = float(tfv) if tf is None else tf
    ts = t0v + (tfv - t0v) * np.asarray(tr.taus)
    if controls is None:
        controls = np.asarray(X)
    if y0 is None:
        y0 = np.asarray(Y[0])
    params = rep.apply_parameters(jnp.asarray(np.asarray(theta)))
    ys = rollout(rep.model, params, jnp.asarray(ts), jnp.asarray(controls),
                 jnp.asarray(y0))
    return tr.pack(t0v, tfv, ys, jnp.asarray(controls), L, D, Gm, pcs, ecs,
                   theta)
