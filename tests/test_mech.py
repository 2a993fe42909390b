"""Multibody core vs closed-form mechanics.

Mirrors the reference's strategy of validating against tiny analytic models
(reference Moco/Moco/Components/ModelFactory.h:39-56 pendulum / point-mass
factories used throughout Moco/Tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opensim_moco_tpu.models import GROUND, MechModelBuilder


def make_pendulum(l=1.3, m=2.1, g=9.81):
    """Point mass m at distance l below a revolute-z joint at the origin.

    theta measured from straight-down (body frame hangs along -y)."""
    b = MechModelBuilder(gravity=(0, -g, 0))
    b.add_body("rod", mass=m, com=(0, -l, 0), kind="revolute",
               axis=(0, 0, 1), coord_name="theta")
    return b.finalize()


def make_double_pendulum(l1=1.0, l2=1.0, m1=1.0, m2=1.0, g=9.81):
    b = MechModelBuilder(gravity=(0, -g, 0))
    b.add_body("link1", mass=m1, com=(0, -l1, 0), kind="revolute",
               axis=(0, 0, 1), coord_name="q1")
    b.add_body("link2", mass=m2, com=(0, -l2, 0), parent="link1",
               kind="revolute", axis=(0, 0, 1), tree_r=(0, -l1, 0),
               coord_name="q2")
    return b.finalize()


def test_pendulum_mass_matrix_and_gravity():
    l, m, g = 1.3, 2.1, 9.81
    model = make_pendulum(l, m, g)
    p = model.default_params()
    for theta in [0.0, 0.4, -1.2, 2.9]:
        q = jnp.array([theta])
        M = model.mass_matrix(p, q)
        np.testing.assert_allclose(np.asarray(M), [[m * l**2]], rtol=1e-12)
        # static gravity torque: tau = m g l sin(theta) to hold the pendulum
        tau = model.rnea(p, q, jnp.zeros(1), jnp.zeros(1))
        np.testing.assert_allclose(np.asarray(tau), [m * g * l * np.sin(theta)],
                                   rtol=1e-12, atol=1e-12)


def test_pendulum_forward_dynamics():
    l, m, g = 1.3, 2.1, 9.81
    model = make_pendulum(l, m, g)
    p = model.default_params()
    q, u = jnp.array([0.7]), jnp.array([0.3])
    udot = model.forward_dynamics(p, q, u, jnp.zeros(1))
    # thetaddot = -(g/l) sin(theta)
    np.testing.assert_allclose(np.asarray(udot), [-(g / l) * np.sin(0.7)],
                               rtol=1e-12)


def test_double_pendulum_mass_matrix_analytic():
    l1, l2, m1, m2 = 1.1, 0.7, 2.0, 1.5
    model = make_double_pendulum(l1, l2, m1, m2)
    p = model.default_params()
    q = jnp.array([0.3, -0.8])
    M = np.asarray(model.mass_matrix(p, q))
    c2 = np.cos(-0.8)
    # textbook planar double pendulum (point masses at rod tips)
    M11 = (m1 + m2) * l1**2 + m2 * l2**2 + 2 * m2 * l1 * l2 * c2
    M12 = m2 * l2**2 + m2 * l1 * l2 * c2
    M22 = m2 * l2**2
    np.testing.assert_allclose(M, [[M11, M12], [M12, M22]], rtol=1e-12)
    assert np.allclose(M, M.T)


def test_double_pendulum_energy_conservation():
    """RK4 rollout of passive dynamics conserves energy to integrator order."""
    model = make_double_pendulum()
    p = model.default_params()
    g = 9.81

    def energy(q, u):
        M = model.mass_matrix(p, q)
        ke = 0.5 * u @ M @ u
        p1 = model.station_position(p, q, 0, jnp.array([0.0, -1.0, 0.0]))
        p2 = model.station_position(p, q, 1, jnp.array([0.0, -1.0, 0.0]))
        pe = g * (p1[1] + p2[1])
        return ke + pe

    def f(state):
        q, u = state[:2], state[2:]
        ud = model.forward_dynamics(p, q, u, jnp.zeros(2))
        return jnp.concatenate([u, ud])

    def rk4(state, dt):
        k1 = f(state)
        k2 = f(state + 0.5 * dt * k1)
        k3 = f(state + 0.5 * dt * k2)
        k4 = f(state + dt * k3)
        return state + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

    dt = 1e-3
    state = jnp.array([1.2, -0.4, 0.0, 0.0])

    def step(s, _):
        return rk4(s, dt), None

    final, _ = jax.lax.scan(step, state, None, length=2000)
    e0 = energy(state[:2], state[2:])
    e1 = energy(final[:2], final[2:])
    assert abs(float(e1 - e0)) < 1e-8


def test_station_kinematics_prismatic_chain():
    """Planar point mass: px, py sliders; station position/velocity."""
    b = MechModelBuilder(gravity=(0, -9.81, 0))
    b.add_body("xtr", mass=0.0, kind="prismatic", axis=(1, 0, 0),
               coord_name="tx")
    b.add_body("mass", mass=3.0, parent="xtr", kind="prismatic",
               axis=(0, 1, 0), coord_name="ty")
    model = b.finalize()
    p = model.default_params()
    q = jnp.array([0.4, -0.2])
    u = jnp.array([1.5, 2.5])
    pos = model.station_position(p, q, 1, jnp.array([0.1, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(pos), [0.5, -0.2, 0.0], atol=1e-14)
    vel = model.station_velocity(p, q, u, 1, jnp.array([0.1, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(vel), [1.5, 2.5, 0.0], atol=1e-14)
    M = model.mass_matrix(p, q)
    np.testing.assert_allclose(np.asarray(M), np.diag([3.0, 3.0]), atol=1e-14)


def test_rotated_station_revolute():
    model = make_pendulum(l=1.0, m=1.0)
    p = model.default_params()
    q = jnp.array([jnp.pi / 2])  # rotate tip from -y to +x
    tip = model.station_position(p, q, 0, jnp.array([0.0, -1.0, 0.0]))
    np.testing.assert_allclose(np.asarray(tip), [1.0, 0.0, 0.0], atol=1e-12)


def test_vmap_and_jit_compose():
    model = make_double_pendulum()
    p = model.default_params()
    qs = jnp.stack([jnp.array([0.1, 0.2]), jnp.array([-0.3, 0.9])])
    Ms = jax.jit(jax.vmap(lambda q: model.mass_matrix(p, q)))(qs)
    assert Ms.shape == (2, 2, 2)
    for i in range(2):
        np.testing.assert_allclose(np.asarray(Ms[i]),
                                   np.asarray(model.mass_matrix(p, qs[i])),
                                   rtol=1e-12)
