"""CustomJoint (OpenSim SpatialTransform) support: autodiff-derived motion
subspaces, including q-dependent S (spline-coupled axes, the walking-model
knee pattern from subject_walk_armless_18musc.osim)."""

import jax
import jax.numpy as jnp
import numpy as np

from opensim_moco_tpu.models import MechModelBuilder


def _pin_equivalent_custom():
    """Custom joint with one z-rotation == plain revolute."""
    ident = lambda v: v
    axes = (
        ((0, 0, 1), ident, 0),  # rotation1 = coord 0
        ((1, 0, 0), None, 0),
        ((0, 1, 0), None, 0),
        ((1, 0, 0), None, 0),
        ((0, 1, 0), None, 0),
        ((0, 0, 1), None, 0),
    )
    b = MechModelBuilder(gravity=(0, -9.81, 0))
    b.add_body("rod", mass=2.1, com=(0, -1.3, 0), kind="custom",
               joint_name="j", coord_names=("theta",), custom_axes=axes)
    return b.finalize()


def test_custom_pin_matches_revolute():
    mc = _pin_equivalent_custom()
    b = MechModelBuilder(gravity=(0, -9.81, 0))
    b.add_body("rod", mass=2.1, com=(0, -1.3, 0), kind="revolute",
               axis=(0, 0, 1), coord_name="theta")
    mr = b.finalize()
    pc, pr = mc.default_params(), mr.default_params()
    for th, w, a in [(0.3, 0.7, -0.4), (-1.1, 0.0, 2.0)]:
        q, u, ud = jnp.array([th]), jnp.array([w]), jnp.array([a])
        np.testing.assert_allclose(
            np.asarray(mc.mass_matrix(pc, q)),
            np.asarray(mr.mass_matrix(pr, q)), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(mc.rnea(pc, q, u, ud)),
            np.asarray(mr.rnea(pr, q, u, ud)), rtol=1e-10, atol=1e-12)
        # frames agree
        Ac, oc = mc.frames(pc, q)[0]
        Ar, orr = mr.frames(pr, q)[0]
        np.testing.assert_allclose(np.asarray(Ac), np.asarray(Ar),
                                   atol=1e-12)


def test_custom_multidof_ball_energy():
    """3-rotation custom joint (ball-ish): passive swing conserves energy."""
    ident = lambda v: v
    axes = (
        ((0, 0, 1), ident, 0),
        ((1, 0, 0), ident, 1),
        ((0, 1, 0), ident, 2),
        ((1, 0, 0), None, 0),
        ((0, 1, 0), None, 0),
        ((0, 0, 1), None, 0),
    )
    b = MechModelBuilder(gravity=(0, -9.81, 0))
    b.add_body("rod", mass=1.0, com=(0, -0.5, 0),
               inertia=np.diag([0.1, 0.02, 0.1]), kind="custom",
               joint_name="ball", coord_names=("rz", "rx", "ry"),
               custom_axes=axes)
    m = b.finalize()
    p = m.default_params()

    def energy(q, u):
        M = m.mass_matrix(p, q)
        A, o = m.frames(p, q)[0]
        com = o + A.T @ jnp.asarray([0.0, -0.5, 0.0])
        return 0.5 * u @ M @ u + 9.81 * com[1]

    def f(s):
        q, u = s[:3], s[3:]
        ud = m.forward_dynamics(p, q, u, jnp.zeros(3))
        return jnp.concatenate([u, ud])

    @jax.jit
    def rk4(s):
        h = 5e-4
        k1 = f(s)
        k2 = f(s + h / 2 * k1)
        k3 = f(s + h / 2 * k2)
        k4 = f(s + h * k3)
        return s + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

    s = jnp.array([0.5, 0.3, -0.2, 0.0, 0.0, 0.0])
    e0 = float(energy(s[:3], s[3:]))
    for _ in range(800):
        s = rk4(s)
    e1 = float(energy(s[:3], s[3:]))
    assert abs(e1 - e0) < 5e-7


def test_spline_coupled_translation_knee_pattern():
    """1-DOF joint whose rotation drives coupled translations (Delp knee):
    check the coupled motion against a hand-built equivalent and verify
    energy conservation (exercises the q-dependent S and Sdot terms)."""
    from opensim_moco_tpu.utils.splines import CubicSpline

    xs = np.linspace(-2.0, 0.2, 12)
    fx = CubicSpline(xs, 0.02 * np.sin(xs))
    fy = CubicSpline(xs, -0.39 + 0.01 * xs ** 2)
    ident = lambda v: v
    axes = (
        ((0, 0, 1), ident, 0),
        ((1, 0, 0), None, 0),
        ((0, 1, 0), None, 0),
        ((1, 0, 0), lambda v: fx(v), 0),
        ((0, 1, 0), lambda v: fy(v), 0),
        ((0, 0, 1), None, 0),
    )
    b = MechModelBuilder(gravity=(0, -9.81, 0))
    b.add_body("tibia", mass=3.0, com=(0, -0.2, 0),
               inertia=np.diag([0.05, 0.005, 0.05]), kind="custom",
               joint_name="knee", coord_names=("knee_angle",),
               custom_axes=axes)
    m = b.finalize()
    p = m.default_params()
    # frame position matches the spline translation
    q = jnp.array([-0.7])
    A, o = m.frames(p, q)[0]
    np.testing.assert_allclose(float(o[0]), float(fx(-0.7)), atol=1e-12)
    np.testing.assert_allclose(float(o[1]), float(fy(-0.7)), atol=1e-12)

    def energy(q, u):
        M = m.mass_matrix(p, q)
        A, o = m.frames(p, q)[0]
        com = o + A.T @ jnp.asarray([0.0, -0.2, 0.0])
        return 0.5 * u @ M @ u + 3.0 * 9.81 * com[1]

    def f(s):
        q, u = s[:1], s[1:]
        ud = m.forward_dynamics(p, q, u, jnp.zeros(1))
        return jnp.concatenate([u, ud])

    import jax as _jax

    @_jax.jit
    def rk4(s):
        h = 2e-4
        k1 = f(s)
        k2 = f(s + h / 2 * k1)
        k3 = f(s + h / 2 * k2)
        k4 = f(s + h * k3)
        return s + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

    s = jnp.array([-0.5, 0.0])
    e0 = float(energy(s[:1], s[1:]))
    for _ in range(1000):
        s = rk4(s)
    e1 = float(energy(s[:1], s[1:]))
    assert abs(e1 - e0) < 1e-6  # fails if the Sdot q-dependence is wrong
