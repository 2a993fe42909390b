"""Spatial (6D) rigid-body algebra in pure JAX.

Featherstone "Rigid Body Dynamics Algorithms" conventions:

* a spatial motion vector is ``[omega; v]`` (angular on top),
* a Pluecker motion transform from frame A to frame B located at position
  ``r`` (in A coordinates) with orientation ``E`` (mapping A coordinates to
  B coordinates) is ``X = [[E, 0], [-E r^, E]]``,
* forces transform with the inverse transpose: ``f_B = X^{-T} f_A``; we use
  the identity ``f_A = X^T f_B`` throughout instead of forming inverses.

This replaces the role Simbody's SimbodyMatterSubsystem plays for the
reference (see SURVEY.md L0; reference delegates to external Simbody). The
functions are pure, trace-friendly (no data-dependent control flow) and
dtype-polymorphic, so they can be vmapped/jitted/sharded freely.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v):
    """3-vector -> 3x3 skew-symmetric matrix (hat operator)."""
    z = jnp.zeros((), dtype=v.dtype)
    return jnp.stack([
        jnp.stack([z, -v[2], v[1]]),
        jnp.stack([v[2], z, -v[0]]),
        jnp.stack([-v[1], v[0], z]),
    ])


def rodrigues(axis, theta):
    """Active rotation matrix R(axis, theta) for a unit axis (static array)."""
    a = jnp.asarray(axis, dtype=jnp.result_type(theta, float))
    K = skew(a)
    s = jnp.sin(theta)
    c = jnp.cos(theta)
    eye = jnp.eye(3, dtype=K.dtype)
    return eye + s * K + (1.0 - c) * (K @ K)


def xform(E, r):
    """Build the 6x6 motion transform [[E,0],[-E r^, E]]."""
    Z = jnp.zeros((3, 3), dtype=E.dtype)
    return jnp.block([[E, Z], [-E @ skew(r), E]])


def xform_inv_T(E, r):
    """Force transform (X^{-T}) for (E, r): [[E, -E r^], [0, E]]."""
    Z = jnp.zeros((3, 3), dtype=E.dtype)
    return jnp.block([[E, -E @ skew(r)], [Z, E]])


def crm(v):
    """Spatial cross product (motion x motion): crm(v) @ m."""
    w = skew(v[:3])
    Z = jnp.zeros((3, 3), dtype=v.dtype)
    return jnp.block([[w, Z], [skew(v[3:]), w]])


def crf(v):
    """Spatial cross product (motion x force): crf(v) = -crm(v)^T."""
    return -crm(v).T


def spatial_inertia(mass, com, inertia_about_com):
    """6x6 spatial inertia about the body-frame origin.

    ``inertia_about_com`` is the 3x3 rotational inertia about the COM in body
    coordinates; ``com`` the COM position in the body frame.
    """
    c = skew(com)
    eye = jnp.eye(3, dtype=c.dtype)
    upper_left = inertia_about_com + mass * (c @ c.T)
    return jnp.block([
        [upper_left, mass * c],
        [mass * c.T, mass * eye],
    ])
