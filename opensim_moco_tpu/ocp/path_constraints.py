"""Canned path constraints.

Reference analogues: MocoControlBoundConstraint
(Moco/Moco/MocoControlBoundConstraint.h:42) and
MocoFrameDistanceConstraint (Moco/Moco/MocoFrameDistanceConstraint.h:78).
Each factory returns ``(fn, lower, upper)`` triples for
``Problem.add_path_constraint``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def control_bound_constraint(control_names, lower_fn=None, upper_fn=None):
    """Keep controls within time-varying function bounds
    (MocoControlBoundConstraint: controls within lower/upper functions of
    time). ``lower_fn``/``upper_fn``: scalar callables of time.

    Returns (fn, lower, upper) where fn emits, per control, the two
    residuals (x - lo(t)) >= 0 and (hi(t) - x) >= 0 as one-sided
    inequalities."""

    def fn(rep, t, y, x, lam, p):
        out = []
        for name in control_names:
            i = rep.control_names.index(name)
            if lower_fn is not None:
                out.append(x[i] - lower_fn(t))
            if upper_fn is not None:
                out.append(upper_fn(t) - x[i])
        return jnp.stack(out)

    k = len(control_names) * ((lower_fn is not None) +
                              (upper_fn is not None))
    return fn, np.zeros(k), np.full(k, np.inf)


def frame_distance_constraint(pairs, min_distance, max_distance,
                              projection=None):
    """Bound the distance between pairs of body-fixed points
    (MocoFrameDistanceConstraint; used to prevent foot interpenetration in
    gait). ``pairs``: ((bodyA, locA, bodyB, locB), ...); optional
    ``projection``: unit 3-vector -> distance of the projected separation
    (MocoFrameDistanceConstraint.h:125 projection support)."""

    def fn(rep, t, y, x, lam, p):
        m = rep.model
        q = y[:m.nq]
        frames = m.mech.frames(p["mech"], q)
        out = []
        for (ba, la, bb, lbv) in pairs:
            pa = (frames[ba][1] + frames[ba][0].T @
                  jnp.asarray(la, dtype=t.dtype)) if ba >= 0 else \
                jnp.asarray(la, dtype=t.dtype)
            pb = (frames[bb][1] + frames[bb][0].T @
                  jnp.asarray(lbv, dtype=t.dtype)) if bb >= 0 else \
                jnp.asarray(lbv, dtype=t.dtype)
            d = pb - pa
            if projection is not None:
                proj = jnp.asarray(projection, dtype=t.dtype)
                d = d - (d @ proj) * proj
            out.append(jnp.sqrt(jnp.sum(d * d) + 1e-12))
        return jnp.stack(out)

    k = len(pairs)
    return fn, np.full(k, float(min_distance)), np.full(k,
                                                        float(max_distance))
