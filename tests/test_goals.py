"""Goal library coverage (mirrors reference testMocoGoals.cpp strategy:
each goal solved/evaluated on a tiny analytic model)."""

import jax.numpy as jnp
import numpy as np
import pytest

from opensim_moco_tpu.models.factory import (create_n_link_pendulum,
                                             create_planar_point_mass,
                                             create_sliding_point_mass)
from opensim_moco_tpu.ocp import (ControlGoal, ControlTrackingGoal,
                                  MarkerFinalGoal, MarkerTrackingGoal,
                                  PeriodicityGoal, Problem, Study,
                                  control_bound_constraint,
                                  frame_distance_constraint)


def test_factory_models():
    m1 = create_sliding_point_mass()
    assert m1.nq == 1 and m1.nx == 1
    m2 = create_planar_point_mass()
    assert m2.nq == 2 and m2.nx == 2
    m3 = create_n_link_pendulum(3)
    assert m3.nq == 3 and m3.nx == 3
    # pendulum M(0) should be positive definite
    p = m3.default_params()
    M = np.asarray(m3.mech.mass_matrix(p["mech"], jnp.zeros(3)))
    assert np.all(np.linalg.eigvalsh(M) > 0)


def test_marker_final_goal_drives_reach():
    """Pendulum tip must reach a target point (MocoMarkerFinalGoal)."""
    model = create_n_link_pendulum(1, link_length=1.0)
    prob = Problem(model)
    prob.set_time_bounds(0, 1)
    prob.set_state_info("/jointset/j0/q0/value", (-4, 4), 0)
    prob.set_state_info("/jointset/j0/q0/speed", (-10, 10), 0, 0)
    prob.set_control_info("/forceset/tau0", (-50, 50))
    # target: tip pointing in +x (q = pi/2)
    prob.add_goal(MarkerFinalGoal(name="reach", body=0,
                                  location=(0, -1, 0), target=(1, 0, 0),
                                  weight=10.0))
    prob.add_goal(ControlGoal(name="effort", weight=0.001))
    study = Study(prob)
    study.set_solver_options(num_mesh_intervals=20)
    study.set_ipm_options(tol=1e-6, max_iter=300)
    sol = study.solve()
    assert sol.success, sol.status
    qf = sol.state("/jointset/j0/q0/value")[-1]
    assert abs(abs(qf) - np.pi / 2) < 0.05


def test_periodicity_goal_negated_pair():
    """Periodic motion with negated speed pair: u(T) = -u(0)."""
    model = create_sliding_point_mass()
    prob = Problem(model)
    prob.set_time_bounds(0, 1)
    prob.set_state_info("/jointset/slider/position/value", (-5, 5), 0, 1)
    prob.set_state_info("/jointset/slider/position/speed", (-10, 10))
    prob.set_control_info("/forceset/actuator", (-50, 50))
    prob.add_goal(PeriodicityGoal(
        name="antisym",
        state_pairs=(("/jointset/slider/position/speed",
                      "/jointset/slider/position/speed", True),)))
    prob.add_goal(ControlGoal(name="effort"))
    study = Study(prob)
    study.set_solver_options(num_mesh_intervals=20)
    study.set_ipm_options(tol=1e-7, max_iter=300)
    sol = study.solve()
    assert sol.success, sol.status
    u = sol.state("/jointset/slider/position/speed")
    np.testing.assert_allclose(u[-1], -u[0], atol=1e-6)


def test_control_bound_constraint():
    """Time-varying control bound: |u| <= 5 + 20 t (MocoControlBoundConstraint
    analogue)."""
    model = create_sliding_point_mass()
    prob = Problem(model)
    prob.set_time_bounds(0, 1)
    prob.set_state_info("/jointset/slider/position/value", (-5, 5), 0, 1)
    prob.set_state_info("/jointset/slider/position/speed", (-10, 10), 0, 0)
    prob.set_control_info("/forceset/actuator", (-50, 50))
    fn, lo, hi = control_bound_constraint(
        ["/forceset/actuator"],
        lower_fn=lambda t: -(5.0 + 20.0 * t),
        upper_fn=lambda t: 5.0 + 20.0 * t)
    prob.add_path_constraint("ctrl_bound", fn, lo, hi)
    from opensim_moco_tpu.ocp import FinalTimeGoal
    prob.add_goal(ControlGoal(name="effort", weight=0.001))
    study = Study(prob)
    study.set_solver_options(num_mesh_intervals=20)
    study.set_ipm_options(tol=1e-6, max_iter=300)
    sol = study.solve()
    assert sol.success, sol.status
    u = sol.control("/forceset/actuator")
    t = sol.time
    assert np.all(np.abs(u) <= 5.0 + 20.0 * t + 1e-4)


def test_marker_tracking_goal_integrand():
    model = create_planar_point_mass()
    rep = Problem(model).create_rep()
    times = np.linspace(0, 1, 5)
    ref = np.stack([times, np.zeros(5), np.zeros(5)], axis=1)
    g = MarkerTrackingGoal(markers={"m": (1, (0, 0, 0))},
                           reference={"m": (times, ref)})
    p = model.default_params()
    y = jnp.array([0.5, 0.0, 0.0, 0.0])
    v = g.integrand(rep, jnp.asarray(0.5), y, jnp.zeros(2), jnp.zeros(0), p)
    assert abs(float(v)) < 1e-12  # exactly on the reference
    y2 = jnp.array([0.7, 0.0, 0.0, 0.0])
    v2 = g.integrand(rep, jnp.asarray(0.5), y2, jnp.zeros(2), jnp.zeros(0), p)
    np.testing.assert_allclose(float(v2), 0.04, rtol=1e-10)


def test_frame_distance_constraint_fn():
    model = create_planar_point_mass()
    rep = Problem(model).create_rep()
    fn, lo, hi = frame_distance_constraint(
        [(1, (0, 0, 0), -1, (0, 0, 0))], 0.1, 10.0)
    p = model.default_params()
    y = jnp.array([3.0, 4.0, 0.0, 0.0])
    d = fn(rep, jnp.asarray(0.0), y, jnp.zeros(2), jnp.zeros(0), p)
    np.testing.assert_allclose(float(d[0]), 5.0, rtol=1e-9)
