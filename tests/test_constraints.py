"""Kinematic constraints + Lagrange multipliers.

Mirrors reference Moco/Tests/testConstraints.cpp: analytic multiplier
checks (:1314) and coupler-constrained double pendulum (:843-896)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opensim_moco_tpu.models import MechModelBuilder
from opensim_moco_tpu.models.model import Model
from opensim_moco_tpu.ocp import ControlGoal, Problem, Study
from opensim_moco_tpu.utils import rollout


def planar_point_mass_on_line(m=2.5, g=9.81):
    """Point mass (tx, ty) constrained to the horizontal line y = 0."""
    b = MechModelBuilder(gravity=(0, -g, 0))
    b.add_body("xtr", mass=0.0, joint_name="tx", kind="prismatic",
               axis=(1, 0, 0), coord_name="tx")
    b.add_body("mass", mass=m, parent="xtr", joint_name="ty",
               kind="prismatic", axis=(0, 1, 0), coord_name="ty")
    model = Model(b.finalize())
    model.add_coordinate_actuator("fx", "tx", optimal_force=1.0)
    model.add_kinematic_constraint("line", lambda mp, q: q[1:2])
    model.finalize()
    return model


@pytest.mark.parametrize("scheme", ["trapezoidal", "hermite-simpson"])
def test_multiplier_matches_analytic_gravity_load(scheme):
    """On the line y=0 the multiplier carries the weight: the y equation is
    m*ydd + lambda = -m*g with ydd = 0, so lambda = -m*g
    (testConstraints.cpp:1314 analytic-multiplier strategy)."""
    m, g = 2.5, 9.81
    model = planar_point_mass_on_line(m, g)
    prob = Problem(model)
    prob.set_time_bounds(0, 1)
    prob.set_state_info("/jointset/tx/tx/value", (-5, 5), 0, 1)
    prob.set_state_info("/jointset/tx/tx/speed", (-10, 10), 0, 0)
    prob.set_state_info("/jointset/ty/ty/value", (-1, 1))
    prob.set_state_info("/jointset/ty/ty/speed", (-10, 10))
    prob.set_control_info("/forceset/fx", (-100, 100))
    prob.add_goal(ControlGoal(name="effort"))
    study = Study(prob)
    study.set_solver_options(transcription_scheme=scheme,
                             num_mesh_intervals=15,
                             enforce_constraint_derivatives=True)
    study.set_ipm_options(tol=1e-6, max_iter=400)
    sol = study.solve()
    assert sol.success, sol.status
    lam = sol.multipliers[:, 0]
    np.testing.assert_allclose(lam, -m * g, rtol=1e-4)
    # y stays on the line
    np.testing.assert_allclose(sol.state("/jointset/ty/ty/value"), 0.0,
                               atol=1e-6)


def test_coupler_constrained_double_pendulum():
    """Double pendulum with q1 = q0 enforced via a kinematic constraint
    (CoordinateCouplerConstraint analogue, testConstraints.cpp:843)."""
    b = MechModelBuilder(gravity=(0, -9.81, 0))
    b.add_body("link1", mass=1.0, com=(0, -0.5, 0),
               inertia=np.diag([0, 0, 1.0 / 12]), joint_name="j0",
               kind="revolute", axis=(0, 0, 1), coord_name="q0")
    b.add_body("link2", mass=1.0, com=(0, -0.5, 0), parent="link1",
               joint_name="j1", kind="revolute", axis=(0, 0, 1),
               tree_r=(0, -1.0, 0), coord_name="q1")
    model = Model(b.finalize())
    model.add_coordinate_actuator("tau0", "q0", optimal_force=1.0,
                                  min_control=-100, max_control=100)
    model.add_coordinate_actuator("tau1", "q1", optimal_force=1.0,
                                  min_control=-100, max_control=100)
    model.add_kinematic_constraint("coupler", lambda mp, q: q[1:2] - q[0:1])
    model.finalize()

    prob = Problem(model)
    prob.set_time_bounds(0, 1)
    prob.set_state_info("/jointset/j0/q0/value", (-5, 5), 0, 0.6)
    prob.set_state_info("/jointset/j1/q1/value", (-5, 5), 0)
    prob.set_state_info("/jointset/j0/q0/speed", (-20, 20), 0, 0)
    prob.set_state_info("/jointset/j1/q1/speed", (-20, 20), 0)
    prob.add_goal(ControlGoal(name="effort", weight=0.5))
    study = Study(prob)
    study.set_solver_options(num_mesh_intervals=15,
                             enforce_constraint_derivatives=True)
    study.set_ipm_options(tol=1e-6, max_iter=500)
    sol = study.solve()
    assert sol.success, sol.status
    q0 = sol.state("/jointset/j0/q0/value")
    q1 = sol.state("/jointset/j1/q1/value")
    np.testing.assert_allclose(q1, q0, atol=1e-6)
    assert abs(q0[-1] - 0.6) < 1e-6
    # velocity-level consistency
    u0 = sol.state("/jointset/j0/q0/speed")
    u1 = sol.state("/jointset/j1/q1/speed")
    np.testing.assert_allclose(u1, u0, atol=1e-5)


def test_solution_physically_consistent_via_rollout():
    """Forward-integrate the solved controls+multipliers and compare states
    (solver-agreement strategy of the reference, adapted: collocation vs
    time-stepping, cf. testMocoInterface.cpp:927 guess round trips)."""
    m, g = 2.5, 9.81
    model = planar_point_mass_on_line(m, g)
    prob = Problem(model)
    prob.set_time_bounds(0, 1)
    prob.set_state_info("/jointset/tx/tx/value", (-5, 5), 0, 1)
    prob.set_state_info("/jointset/tx/tx/speed", (-10, 10), 0, 0)
    prob.set_state_info("/jointset/ty/ty/value", (-1, 1))
    prob.set_state_info("/jointset/ty/ty/speed", (-10, 10))
    prob.set_control_info("/forceset/fx", (-100, 100))
    prob.add_goal(ControlGoal(name="effort"))
    study = Study(prob)
    study.set_solver_options(num_mesh_intervals=20)
    study.set_ipm_options(tol=1e-7, max_iter=400)
    sol = study.solve()
    assert sol.success

    # roll out with constraint forces -G^T lam applied via lam interpolation
    p = model.default_params()
    tg = jnp.asarray(sol.time)
    X = jnp.asarray(sol.controls)
    lam_tab = jnp.asarray(sol.multipliers)

    def f(t, y):
        q, u, z = model.split_state(y)
        x = jax.vmap(lambda col: jnp.interp(t, tg, col))(X.T)
        lam = jax.vmap(lambda col: jnp.interp(t, tg, col))(lam_tab.T)
        return model.state_derivatives(p, t, q, u, z, x, lam)

    y = jnp.asarray(sol.states[0])
    ts = np.asarray(sol.time)
    for i in range(len(ts) - 1):
        h = (ts[i + 1] - ts[i]) / 4
        t = ts[i]
        for _ in range(4):
            k1 = f(t, y)
            k2 = f(t + h / 2, y + h / 2 * k1)
            k3 = f(t + h / 2, y + h / 2 * k2)
            k4 = f(t + h, y + h * k3)
            y = y + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            t += h
    np.testing.assert_allclose(np.asarray(y), sol.states[-1], atol=2e-3)


def _double_pendulum(g=9.81):
    b = MechModelBuilder(gravity=(0.0, -g, 0.0))
    b.add_body("l1", mass=1.0, com=(0.5, 0, 0), inertia=np.diag(
        [0.0, 0.0, 1.0 / 12]), joint_name="j1", kind="revolute",
        axis=(0, 0, 1), coord_name="q1")
    b.add_body("l2", mass=1.0, com=(0.5, 0, 0), inertia=np.diag(
        [0.0, 0.0, 1.0 / 12]), joint_name="j2", kind="revolute",
        axis=(0, 0, 1), parent="l1", tree_r=(1.0, 0.0, 0.0),
        coord_name="q2")
    return b


def test_constraint_type_zoo_phi_values():
    """phi(q) of each Simbody-analogue constraint type at known poses
    (reference type coverage: testConstraints.cpp:225-367)."""
    b = _double_pendulum()
    model = Model(b.finalize())
    model.add_point_constraint("pt", 1, (1.0, 0, 0), -1, (2.0, 0.0, 0.0))
    model.add_weld_constraint("weld", 1, -1, (1.0, 0, 0), (2.0, 0.0, 0.0))
    model.add_point_on_line_constraint(
        "pol", -1, (0.0, 0.0, 0.0), (1.0, 0.0, 0.0), 1, (1.0, 0.0, 0.0))
    model.add_constant_distance_constraint(
        "dist", -1, (0.0, 0.0, 0.0), 1, (1.0, 0.0, 0.0), 2.0)
    model.add_locked_coordinate_constraint("lock", "q2", 0.3)
    model.finalize()
    p = model.default_params()

    # stretched horizontal: tip at (2, 0, 0)
    q = jnp.asarray([0.0, 0.0])
    phi = np.asarray(model.phi(p, q))
    # point (3) + weld (6) + point-on-line (2) + distance (1) + lock (1)
    assert phi.shape == (13,)
    np.testing.assert_allclose(phi[:3], 0.0, atol=1e-12)       # tip at (2,0,0)
    np.testing.assert_allclose(phi[3:9], 0.0, atol=1e-12)      # weld aligned
    np.testing.assert_allclose(phi[9:11], 0.0, atol=1e-12)     # tip on x-axis
    np.testing.assert_allclose(phi[11], 0.0, atol=1e-12)       # |tip| = 2
    np.testing.assert_allclose(phi[12], -0.3, atol=1e-12)      # q2 - 0.3

    # elbow at 90 deg: tip at (1, 1, 0)
    q = jnp.asarray([0.0, np.pi / 2])
    phi = np.asarray(model.phi(p, q))
    np.testing.assert_allclose(phi[:3], [-1.0, 1.0, 0.0], atol=1e-12)
    # weld rotation rows: relative angle pi/2 about z -> rot = [0,0,sin]
    np.testing.assert_allclose(phi[6:9], [0.0, 0.0, -np.sin(np.pi / 2)],
                               atol=1e-12)
    # point-on-line: off-axis y component = 1
    assert abs(abs(phi[9]) + abs(phi[10]) - 1.0) < 1e-12
    # distance: |(1,1)| = sqrt(2); phi = (2 - 4)/(2*2)
    np.testing.assert_allclose(phi[11], 0.5 * (2.0 - 4.0) / 2.0, atol=1e-12)


def test_locked_coordinate_multiplier_analytic():
    """Pendulum with its coordinate locked: constrained dynamics give
    udot = 0 and the multiplier carries the exact gravity torque
    (multiplier-vs-analytic strategy of testConstraints.cpp:1314)."""
    g = 9.81
    b = MechModelBuilder(gravity=(0.0, -g, 0.0))
    b.add_body("l1", mass=1.0, com=(0.5, 0, 0), inertia=np.diag(
        [0.0, 0.0, 1.0 / 12]), joint_name="j1", kind="revolute",
        axis=(0, 0, 1), coord_name="q1")
    model = Model(b.finalize())
    model.add_locked_coordinate_constraint("lock", "q1", 0.2)
    model.finalize()
    p = model.default_params()
    q = jnp.asarray([0.2])
    u = jnp.zeros(1)
    z = jnp.zeros(0)
    x = jnp.zeros(0)
    # solve the constrained system [M G^T; G 0][udot; lam] = [tau; 0]
    M = np.asarray(model.mech.mass_matrix(p["mech"], q))
    G = np.asarray(model.constraint_jacobian(p, q))
    tau = np.asarray(model.applied_generalized_forces(p, 0.0, q, u, z, x))
    bias = np.asarray(model.mech.bias_forces(p["mech"], q, u))
    K = np.block([[M, G.T], [G, np.zeros((1, 1))]])
    sol = np.linalg.solve(K, np.concatenate([tau - bias, [0.0]]))
    udot, lam = sol[0], sol[1]
    np.testing.assert_allclose(udot, 0.0, atol=1e-12)
    # gravity torque on the locked pendulum: -m g (L/2) cos(q)
    np.testing.assert_allclose(lam, -1.0 * g * 0.5 * np.cos(0.2),
                               rtol=1e-12)
    # the model's own constrained explicit dynamics agree
    udot2 = np.asarray(model.multibody_explicit(
        p, 0.0, q, u, z, x, jnp.asarray([lam])))
    np.testing.assert_allclose(udot2, 0.0, atol=1e-10)


@pytest.mark.slow
def test_point_constraint_supported_pendulum_solve():
    """Double pendulum with its tip pinned to ground: the structure is
    statically supported, so the min-effort hold needs zero control and
    the multipliers carry gravity (testConstraints.cpp:843-896 pattern)."""
    b = _double_pendulum()
    model = Model(b.finalize())
    model.add_coordinate_actuator("t1", "q1", optimal_force=20.0)
    model.add_coordinate_actuator("t2", "q2", optimal_force=20.0)
    # pin the tip at (1, 1, 0): consistent with q = (0, pi/2)
    model.add_point_constraint("pin", 1, (1.0, 0.0, 0.0), -1,
                               (1.0, 1.0, 0.0))
    model.finalize()

    prob = Problem(model)
    prob.set_time_bounds(0, 0.5)
    q0 = (0.0, np.pi / 2)
    prob.set_state_info("/jointset/j1/q1/value", (-2, 2), q0[0])
    prob.set_state_info("/jointset/j2/q2/value", (-2, 3), q0[1])
    prob.add_goal(ControlGoal(name="effort"))
    study = Study(prob)
    study.set_solver_options(num_mesh_intervals=6,
                             transcription_scheme="hermite-simpson")
    study.set_ipm_options(tol=1e-6, max_iter=500)
    sol = study.solve()
    assert sol.success
    # zero effort: the pin carries the load
    assert sol.objective < 1e-6
    np.testing.assert_allclose(sol.state("/jointset/j1/q1/value"), q0[0],
                               atol=1e-4)
    np.testing.assert_allclose(sol.state("/jointset/j2/q2/value"), q0[1],
                               atol=1e-4)
