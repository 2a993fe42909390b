"""Muscle-path wrapping surfaces.

Cylinder wrap via the obstacle-set method (Garner & Pandy 2000), the
geometry behind OpenSim's WrapCylinder (used 40x by the reference's
subject_walk_armless_18musc.osim gait model). Fully differentiable:

* in the cylinder cross-section, the shortest path from P to Q around a
  circle of radius R is tangent-arc-tangent;
* developing (unrolling) the cylinder + tangent planes, the 3D shortest
  path is a straight line, so its length is
  ``sqrt(L_plane^2 + dz^2)`` with ``L_plane = d_P + R*arc + d_Q``;
* the wrap engages only when the planar segment crosses the circle; at
  grazing incidence the wrapped and straight lengths agree, so the switch
  (`jnp.where`) is continuous.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class WrapCylinderSpec:
    """Cylinder fixed in a body. ``translation``/``xyz_rotation`` give the
    cylinder frame pose in the body (axis = local z). ``quadrant``
    restricts which side of the cylinder the path may wrap around
    (OpenSim WrapObject quadrant: 'all', '+x', '-x', '+y', '-y')."""
    name: str
    body: int
    translation: tuple
    xyz_rotation: tuple
    radius: float
    quadrant: str = "all"

    def rotation(self):
        """Body->cylinder coordinate map E (numpy, static)."""
        rx, ry, rz = self.xyz_rotation
        cx, sx = np.cos(rx), np.sin(rx)
        cy, sy = np.cos(ry), np.sin(ry)
        cz, sz = np.cos(rz), np.sin(rz)
        Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        return (Rx @ Ry @ Rz).T


def _wrap_length_2d(p, q, R, quadrant_sign, quadrant_axis):
    """Planar tangent-arc-tangent length around the circle of radius R.

    Returns (planar_length, engaged). ``engaged`` is False when the
    straight segment clears the circle or the wrap would be on the
    inactive side."""
    rp = jnp.sqrt(p @ p)
    rq = jnp.sqrt(q @ q)
    # tangent lengths (guard points inside the circle: clamp)
    dp = jnp.sqrt(jnp.maximum(rp ** 2 - R ** 2, 1e-12))
    dq = jnp.sqrt(jnp.maximum(rq ** 2 - R ** 2, 1e-12))
    # angles of p, q and tangent half-angles
    ap = jnp.arctan2(p[1], p[0])
    aq = jnp.arctan2(q[1], q[0])
    bp = jnp.arccos(jnp.clip(R / jnp.maximum(rp, R + 1e-12), -1.0, 1.0))
    bq = jnp.arccos(jnp.clip(R / jnp.maximum(rq, R + 1e-12), -1.0, 1.0))
    # Two tangent-point pairings; for each, the arc's travel direction is
    # fixed by tangent consistency: the incoming segment direction at the
    # entry tangent point must match the arc's velocity there.
    def candidate(tp, tq):
        Tp = R * jnp.stack([jnp.cos(tp), jnp.sin(tp)])
        d_ccw = jnp.stack([-jnp.sin(tp), jnp.cos(tp)])
        sigma = jnp.sign(jnp.sum((Tp - p) * d_ccw) + 1e-16)
        arc = jnp.mod(sigma * (tq - tp), 2 * jnp.pi)
        mid = tp + sigma * 0.5 * arc
        return dp + R * arc + dq, mid

    len_a, mid_a = candidate(ap + bp, aq - bq)
    len_b, mid_b = candidate(ap - bp, aq + bq)

    if quadrant_axis is None:
        planar = jnp.minimum(len_a, len_b)
        engaged_side = jnp.asarray(True)
    else:
        # pick the pairing whose arc midpoint lies on the active side
        mid_pt_a = jnp.stack([jnp.cos(mid_a), jnp.sin(mid_a)])
        mid_pt_b = jnp.stack([jnp.cos(mid_b), jnp.sin(mid_b)])
        ok_a = quadrant_sign * mid_pt_a[quadrant_axis] >= 0
        ok_b = quadrant_sign * mid_pt_b[quadrant_axis] >= 0
        planar = jnp.where(ok_a & ok_b, jnp.minimum(len_a, len_b),
                           jnp.where(ok_a, len_a, len_b))
        engaged_side = ok_a | ok_b

    # does the straight planar segment cross the circle?
    d = q - p
    dd = d @ d
    tpar = jnp.clip(-(p @ d) / jnp.maximum(dd, 1e-16), 0.0, 1.0)
    closest = p + tpar * d
    crosses = (closest @ closest) < R ** 2
    if quadrant_axis is not None:
        # OpenSim mandatory far-side wrap (WrapCylinder::wrapLine with
        # _wrapSign): when the straight segment passes on the side
        # OPPOSITE the active quadrant, the path must still wrap around
        # the quadrant side (e.g. psoas over the pelvic brim, quadrant
        # -y: the chord passes above the brim center, the muscle bends
        # under it)
        far_side = quadrant_sign * closest[quadrant_axis] < 0
        crosses = crosses | far_side
    return planar, crosses & engaged_side


_AXIS = {"x": 0, "y": 1}


def cylinder_wrap_length(P, Q, radius, quadrant="all"):
    """Length of the shortest path P -> (around cylinder, axis = z,
    centered at origin) -> Q; falls back to |PQ| when the wrap does not
    engage. P, Q: (3,) points in the cylinder frame."""
    p2, q2 = P[:2], Q[:2]
    if quadrant in (None, "all", ""):
        axis, sign = None, 1.0
    else:
        sign = -1.0 if quadrant.startswith("-") else 1.0
        axis = _AXIS[quadrant.lstrip("+-")]
    planar, engaged = _wrap_length_2d(p2, q2, radius, sign, axis)
    dz = Q[2] - P[2]
    wrapped = jnp.sqrt(planar ** 2 + dz ** 2)
    straight = jnp.sqrt(jnp.sum((Q - P) ** 2) + 1e-30)
    return jnp.where(engaged, jnp.maximum(wrapped, straight), straight)
