"""Joint child-frame offsets (OpenSim two-sided PhysicalOffsetFrames)."""

import jax.numpy as jnp
import numpy as np

from opensim_moco_tpu.models import MechModelBuilder


def test_child_offset_pendulum_equivalence():
    """A pendulum modeled with the pivot at the TOP of the child body via a
    child offset must match the classic formulation (com below joint).

    Classic: joint at origin, com at (0,-l). Offset variant (OpenSim
    style): child body frame at its com, joint frame at (0, +l) in the
    child frame."""
    l, m, g = 1.3, 2.1, 9.81
    classic = MechModelBuilder(gravity=(0, -g, 0))
    classic.add_body("rod", mass=m, com=(0, -l, 0), kind="revolute",
                     axis=(0, 0, 1), coord_name="theta")
    mc = classic.finalize()

    offset = MechModelBuilder(gravity=(0, -g, 0))
    offset.add_body("rod", mass=m, com=(0, 0, 0), kind="revolute",
                    axis=(0, 0, 1), coord_name="theta",
                    child_r=(0, l, 0))
    mo = offset.finalize()

    pc = mc.default_params()
    po = mo.default_params()
    for theta in [0.0, 0.5, -1.1]:
        q = jnp.array([theta])
        u = jnp.array([0.4])
        np.testing.assert_allclose(
            np.asarray(mo.mass_matrix(po, q)),
            np.asarray(mc.mass_matrix(pc, q)), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(mo.bias_forces(po, q, u)),
            np.asarray(mc.bias_forces(pc, q, u)), rtol=1e-12, atol=1e-12)
        # com world position matches the classic tip position
        com_o = mo.station_position(po, q, 0, jnp.zeros(3))
        com_c = mc.station_position(pc, q, 0, jnp.array([0.0, -l, 0.0]))
        np.testing.assert_allclose(np.asarray(com_o), np.asarray(com_c),
                                   atol=1e-12)


def test_rotated_child_offset_consistency():
    """Energy conservation with arbitrary rotated child offsets (checks S
    transformation into child-body coordinates)."""
    import jax

    from opensim_moco_tpu.models.spatial import rodrigues

    Ec = np.asarray(rodrigues(jnp.array([0.0, 0.0, 1.0]), 0.7)).T
    b = MechModelBuilder(gravity=(0, -9.81, 0))
    b.add_body("link", mass=1.5, com=(0.2, -0.4, 0.1),
               inertia=np.diag([0.1, 0.12, 0.2]), kind="revolute",
               axis=(0, 0, 1), coord_name="q0", tree_r=(0.1, 0.0, 0.0),
               child_r=(0.0, 0.5, 0.0), child_E=Ec)
    m = b.finalize()
    p = m.default_params()

    def energy(q, u):
        M = m.mass_matrix(p, q)
        frames = m.frames(p, q)
        A, o = frames[0]
        com_w = o + A.T @ jnp.asarray([0.2, -0.4, 0.1])
        return 0.5 * u @ M @ u + 9.81 * 1.5 * com_w[1]

    def f(s):
        q, u = s[:1], s[1:]
        return jnp.concatenate([u, m.forward_dynamics(p, q, u, jnp.zeros(1))])

    def rk4(s, dt):
        k1, k2 = f(s), f(s + 0.5e-3 * f(s))
        k3 = f(s + 0.5e-3 * k2)
        k4 = f(s + 1e-3 * k3)
        return s + 1e-3 / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

    s = jnp.array([0.9, 0.0])
    step = jax.jit(lambda s: rk4(s, 1e-3))
    s_t = s
    for _ in range(1000):
        s_t = step(s_t)
    e0 = float(energy(s[:1], s[1:]))
    e1 = float(energy(s_t[:1], s_t[1:]))
    assert abs(e1 - e0) < 1e-6
