"""Cylinder wrapping geometry (WrapCylinder analogue)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opensim_moco_tpu.models.wrap import cylinder_wrap_length


def test_no_wrap_when_segment_clears_cylinder():
    P = jnp.array([-1.0, 0.5, 0.0])
    Q = jnp.array([1.0, 0.5, 0.3])
    R = 0.2
    L = float(cylinder_wrap_length(P, Q, R))
    np.testing.assert_allclose(L, float(jnp.linalg.norm(Q - P)), rtol=1e-12)


def _seg_clears(A, B, R):
    """Segment A-B stays outside the circle (allowing tangency)."""
    d = B - A
    t = np.clip(-(A @ d) / max(d @ d, 1e-16), 0.0, 1.0)
    c = A + t * d
    return c @ c >= R ** 2 - 1e-9


def _brute_force_wrap(P2, Q2, R, n=4000):
    """Independent check: minimize |P-T1| + arc + |T2-Q| over circle-point
    pairs, rejecting segments that cut through the circle."""
    phis = np.linspace(-np.pi, np.pi, n, endpoint=False)
    T = np.stack([R * np.cos(phis), R * np.sin(phis)], axis=1)
    dP = np.linalg.norm(T - P2, axis=1)
    dQ = np.linalg.norm(T - Q2, axis=1)
    okP = np.array([_seg_clears(P2, T[i], R) for i in range(n)])
    okQ = np.array([_seg_clears(T[i], Q2, R) for i in range(n)])
    best = np.inf
    for i in range(0, n, 8):
        if not okP[i]:
            continue
        arc = np.abs((phis - phis[i]) % (2 * np.pi))
        arc = np.minimum(arc, 2 * np.pi - arc)
        total = np.where(okQ, dP[i] + R * arc + dQ, np.inf)
        best = min(best, float(np.min(total)))
    return best


def test_symmetric_wrap_vs_brute_force():
    """Segment crosses the circle (h < R): wrapped length matches a dense
    brute-force tangent search."""
    a, h, R = 1.0, 0.2, 0.4
    P = jnp.array([-a, -h, 0.0])
    Q = jnp.array([a, -h, 0.0])
    L = float(cylinder_wrap_length(P, Q, R))
    straight = float(jnp.linalg.norm(Q - P))
    assert L > straight  # the wrap engages
    expected = _brute_force_wrap(np.array([-a, -h]), np.array([a, -h]), R)
    np.testing.assert_allclose(L, expected, rtol=1e-3)


def test_wrap_longer_than_straight_and_continuous():
    """Wrapped length >= straight distance; continuous at grazing."""
    R = 0.3
    for h in [0.31, 0.301, 0.2999, 0.29, 0.2]:
        P = jnp.array([-1.0, -h, 0.0])
        Q = jnp.array([1.0, -h, 0.1])
        L = float(cylinder_wrap_length(P, Q, R))
        straight = float(jnp.linalg.norm(Q - P))
        assert L >= straight - 1e-12
    # near-grazing: wrap and straight nearly equal
    P = jnp.array([-1.0, -R - 1e-6, 0.0])
    Q = jnp.array([1.0, -R - 1e-6, 0.0])
    L = float(cylinder_wrap_length(P, Q, R))
    straight = float(jnp.linalg.norm(Q - P))
    assert abs(L - straight) < 1e-4


def test_helical_wrap_with_axial_offset():
    """Unrolled-development length: sqrt(planar^2 + dz^2)."""
    a, h, R = 1.0, 0.2, 0.4
    P = jnp.array([-a, -h, 0.0])
    Q = jnp.array([a, -h, 0.7])
    L0 = float(cylinder_wrap_length(jnp.array([-a, -h, 0.0]),
                                    jnp.array([a, -h, 0.0]), R))
    L = float(cylinder_wrap_length(P, Q, R))
    np.testing.assert_allclose(L, np.sqrt(L0 ** 2 + 0.7 ** 2), rtol=1e-9)


def test_quadrant_selects_wrap_side():
    """With quadrant '-y' the path wraps under; '+y' forces over the top
    (longer for symmetric points below the center)."""
    a, h, R = 1.0, 0.2, 0.4
    P = jnp.array([-a, -h, 0.0])
    Q = jnp.array([a, -h, 0.0])
    L_under = float(cylinder_wrap_length(P, Q, R, quadrant="-y"))
    L_over = float(cylinder_wrap_length(P, Q, R, quadrant="+y"))
    assert L_over > L_under


def test_differentiable():
    R = 0.3
    g = jax.grad(lambda h: cylinder_wrap_length(
        jnp.array([-1.0, -h, 0.0]), jnp.array([1.0, -h, 0.1]), R))(0.25)
    assert np.isfinite(float(g))
