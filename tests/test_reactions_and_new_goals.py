"""Joint reactions + the contact/acceleration/joint-reaction/velocity-
equilibrium goals (reference MocoJointReactionGoal.cpp,
MocoContactTrackingGoal.cpp, MocoAccelerationTrackingGoal,
MocoInitialVelocityEquilibriumDGFGoal.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from opensim_moco_tpu.models import MechModelBuilder
from opensim_moco_tpu.models import muscle as dgf
from opensim_moco_tpu.models.model import Model
from opensim_moco_tpu.ocp import (AccelerationTrackingGoal,
                                  ContactTrackingGoal, JointReactionGoal,
                                  InitialVelocityEquilibriumDGFGoal)


def _pendulum(L=0.7, m=2.3):
    b = MechModelBuilder(gravity=(0.0, -9.81, 0.0))
    b.add_body("rod", mass=m, com=(L, 0, 0),
               inertia=((0, 0, 0), (0, 0, 0), (0, 0, 0)),
               joint_name="pin", kind="revolute", axis=(0, 0, 1),
               coord_name="theta")
    model = Model(b.finalize())
    model.add_coordinate_actuator("tau", "theta", optimal_force=1.0,
                                  min_control=-50, max_control=50)
    return model.finalize(), L, m


def test_pendulum_joint_reaction_analytic():
    """Point-mass pendulum: pin reaction force = m (a_com - g); reaction
    moment about the pin axis = applied motor torque (the motor acts
    between the two bodies, so its torque is transmitted)."""
    model, L, m = _pendulum()
    p = model.default_params()
    theta, omega, tau = 0.35, 1.4, 2.0
    q = jnp.array([theta])
    u = jnp.array([omega])
    x = jnp.array([tau])
    z = jnp.zeros(0)
    lam = jnp.zeros(0)
    g = 9.81

    t = jnp.asarray(0.0)
    udot = model.multibody_explicit(p, t, q, u, z, x, lam)
    alpha = float(udot[0])
    # analytic: I alpha = tau - m g L cos(theta)
    np.testing.assert_allclose(alpha,
                               (tau - m * g * L * np.cos(theta)) /
                               (m * L * L), rtol=1e-12)

    reac = np.asarray(model.joint_reaction(p, t, q, u, z, x, lam))[0]
    # com acceleration in world
    e_r = np.array([np.cos(theta), np.sin(theta), 0.0])
    e_t = np.array([-np.sin(theta), np.cos(theta), 0.0])
    a_com = -L * omega ** 2 * e_r + L * alpha * e_t
    f_expected = m * (a_com - np.array([0.0, -g, 0.0]))
    np.testing.assert_allclose(reac[3:], f_expected, atol=1e-9)
    np.testing.assert_allclose(reac[2], tau, atol=1e-9)
    np.testing.assert_allclose(reac[:2], 0.0, atol=1e-9)


def test_joint_reaction_goal_integrand():
    from opensim_moco_tpu.ocp.problem import Problem

    model, L, m = _pendulum()
    pr = Problem(model)
    pr.set_time_bounds(0.0, 1.0)
    rep = pr.create_rep()
    goal = JointReactionGoal(joint=0, measures=("force-x", "force-y"))
    p = model.default_params()
    y = jnp.array([0.35, 1.4])
    x = jnp.array([2.0])
    val = goal.integrand(rep, jnp.asarray(0.0), y, x, jnp.zeros(0), p)
    reac = np.asarray(model.joint_reaction(
        p, jnp.asarray(0.0), y[:1], y[1:2], jnp.zeros(0), x, jnp.zeros(0)))[0]
    np.testing.assert_allclose(float(val), reac[3] ** 2 + reac[4] ** 2,
                               rtol=1e-10)


def _contact_point_mass():
    b = MechModelBuilder(gravity=(0.0, -9.81, 0.0))
    b.add_body("m", mass=1.0, joint_name="jy", kind="prismatic",
               axis=(0, 1, 0), coord_name="y")
    model = Model(b.finalize())
    model.add_sphere_contact("s1", 0, (0.0, 0.0, 0.0), radius=0.05,
                             stiffness=1e6, dissipation=2.0)
    return model.finalize()


def test_contact_forces_match_generalized_forces():
    """For a vertical slider, tau_y must equal the y-component of the
    contact force (Jacobian-transpose of a unit-y direction)."""
    model = _contact_point_mass()
    p = model.default_params()
    q = jnp.array([0.02])  # sphere bottom below ground
    u = jnp.array([-0.1])
    t = jnp.asarray(0.0)
    f = model.contact_forces(p, t, q, u)["s1"]
    tau = model.applied_generalized_forces(p, t, q, u, jnp.zeros(0),
                                           jnp.zeros(0))
    np.testing.assert_allclose(float(tau[0]), float(f[1]), rtol=1e-9)
    assert float(f[1]) > 0.0  # compression


def test_contact_tracking_goal_zero_when_exact():
    from opensim_moco_tpu.ocp.problem import Problem

    model = _contact_point_mass()
    pr = Problem(model)
    pr.set_time_bounds(0.0, 1.0)
    rep = pr.create_rep()
    p = model.default_params()
    t = jnp.asarray(0.3)
    y = jnp.array([0.02, -0.1])
    f = np.asarray(model.contact_forces(p, t, y[:1], y[1:]) ["s1"])
    times = np.linspace(0, 1, 5)
    ref = np.tile(f, (5, 1))
    goal = ContactTrackingGoal(groups=((("s1",), "grf"),),
                               reference={"grf": (times, ref)})
    val = goal.integrand(rep, t, y, jnp.zeros(0), jnp.zeros(0), p)
    np.testing.assert_allclose(float(val), 0.0, atol=1e-12)
    # offset reference -> positive, normalized by m*g
    ref2 = ref + np.array([0.0, 9.81, 0.0])
    goal2 = ContactTrackingGoal(groups=((("s1",), "grf"),),
                                reference={"grf": (times, ref2)})
    val2 = goal2.integrand(rep, t, y, jnp.zeros(0), jnp.zeros(0), p)
    np.testing.assert_allclose(float(val2), 9.81, rtol=1e-9)


def test_acceleration_tracking_goal():
    from opensim_moco_tpu.ocp.problem import Problem

    model, L, m = _pendulum()
    pr = Problem(model)
    pr.set_time_bounds(0.0, 1.0)
    rep = pr.create_rep()
    p = model.default_params()
    t = jnp.asarray(0.0)
    y = jnp.array([0.35, 1.4])
    x = jnp.array([2.0])
    udot = model.multibody_explicit(p, t, y[:1], y[1:], jnp.zeros(0), x,
                                    jnp.zeros(0))
    # body origin is AT the pin: acceleration is zero there
    goal = AccelerationTrackingGoal(
        reference={0: (np.linspace(0, 1, 3), np.zeros((3, 3)))})
    val = goal.integrand(rep, t, y, x, jnp.zeros(0), p)
    np.testing.assert_allclose(float(val), 0.0, atol=1e-12)


def test_initial_velocity_equilibrium_dgf():
    """residual-derivative = k_f v_f - k_T v_T; zero at rest with dft=0,
    and the endpoint-constraint values must match hand evaluation."""
    b = MechModelBuilder(gravity=(9.81, 0.0, 0.0))
    b.add_body("m", mass=1.0, joint_name="j", kind="prismatic",
               axis=(1, 0, 0), coord_name="h")
    model = Model(b.finalize())
    params = dgf.default_muscle_params(
        max_isometric_force=50.0, optimal_fiber_length=0.10,
        tendon_slack_length=0.05, tendon_strain_at_one_norm_force=0.049)
    model.add_muscle("mus", path=[(-1, (0, 0, 0)), (0, (0, 0, 0))],
                     params=params, ignore_activation_dynamics=True,
                     tendon_dynamics_implicit=True)
    model.finalize()

    from opensim_moco_tpu.ocp.problem import Problem
    pr = Problem(model)
    pr.set_time_bounds(0.0, 1.0)
    rep = pr.create_rep()
    goal = InitialVelocityEquilibriumDGFGoal()
    assert goal.auto_outputs(rep) == 1

    # at rest (u = 0) with dft = 0: v_f = v_T = 0 -> residual 0
    y0 = jnp.array([0.14, 0.0, 0.5])  # q, u, norm tendon force
    x0 = jnp.array([0.3])
    d0 = jnp.array([0.0])
    initial = (jnp.asarray(0.0), y0, x0, jnp.zeros(0), d0)
    vals = goal.values(rep, initial, initial, model.default_params())
    np.testing.assert_allclose(np.asarray(vals), 0.0, atol=1e-12)

    # moving (u != 0), dft = 0: tendon velocity is 0, so
    # residual = (k_f + k_T) * vMT (normalized by fmax)
    y1 = jnp.array([0.14, 0.25, 0.5])
    initial1 = (jnp.asarray(0.0), y1, x0, jnp.zeros(0), d0)
    vals1 = np.asarray(goal.values(rep, initial1, initial1,
                                   model.default_params()))
    assert abs(vals1[0]) > 1e-6
    # and it scales linearly with vMT when dft = 0 (k's depend on lMT only)
    y2 = jnp.array([0.14, 0.5, 0.5])
    initial2 = (jnp.asarray(0.0), y2, x0, jnp.zeros(0), d0)
    vals2 = np.asarray(goal.values(rep, initial2, initial2,
                                   model.default_params()))
    # fv multiplier varies with velocity, so only approximately linear
    np.testing.assert_allclose(vals2[0] / vals1[0], 2.0, rtol=0.2)
