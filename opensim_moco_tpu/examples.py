"""Canonical example problems = the BASELINE.json configs.

Each builder mirrors one reference example (cited per function) and returns
a ready-to-solve :class:`~opensim_moco_tpu.ocp.study.Study`.
"""

from __future__ import annotations

import numpy as np

from .models import MechModelBuilder
from .models import muscle as dgf
from .models.model import Model
from .ocp import ControlGoal, FinalTimeGoal, MarkerFinalGoal, Problem, Study


def sliding_mass_study(num_mesh_intervals=50, scheme="trapezoidal"):
    """exampleSlidingMass (reference
    Moco/Examples/C++/exampleSlidingMass/exampleSlidingMass.cpp): point mass
    on a slider, move 0 -> 1 m, minimize effort, final time free in [0, 5].
    """
    b = MechModelBuilder(gravity=(0.0, 0.0, 0.0))
    b.add_body("body", mass=2.0, joint_name="slider", kind="prismatic",
               axis=(1, 0, 0), coord_name="position")
    model = Model(b.finalize())
    model.add_coordinate_actuator("actuator", "position", optimal_force=1.0)
    model.finalize()

    prob = Problem(model)
    prob.set_time_bounds(0, (0, 5))
    prob.set_state_info("/jointset/slider/position/value", (-5, 5), 0, 1)
    prob.set_state_info("/jointset/slider/position/speed", (-50, 50), 0, 0)
    prob.set_control_info("/forceset/actuator", (-50, 50))
    prob.add_goal(FinalTimeGoal(name="time"))

    study = Study(prob)
    study.set_solver_options(transcription_scheme=scheme,
                             num_mesh_intervals=num_mesh_intervals)
    return study


def kirk_min_effort_study(num_mesh_intervals=50, scheme="hermite-simpson"):
    """Kirk 1998 example 5.1-1 (reference testMocoAnalytic.cpp:57-100)."""
    b = MechModelBuilder(gravity=(0.0, 0.0, 0.0))
    b.add_body("b", mass=1.0, joint_name="j", kind="prismatic",
               axis=(1, 0, 0), coord_name="coord")
    model = Model(b.finalize())
    model.add_spring_generalized_force("damper", "coord", viscosity=-1.0)
    model.add_coordinate_actuator("actuator", "coord", optimal_force=1.0)
    model.finalize()

    prob = Problem(model)
    prob.set_time_bounds(0, 2)
    prob.set_state_info("/jointset/j/coord/value", (-10, 10), 0, 5)
    prob.set_state_info("/jointset/j/coord/speed", (-10, 10), 0, 2)
    prob.set_control_info("/forceset/actuator", (-50, 50))
    prob.add_goal(ControlGoal(name="effort", weight=0.5))

    study = Study(prob)
    study.set_solver_options(transcription_scheme=scheme,
                             num_mesh_intervals=num_mesh_intervals)
    return study


def double_pendulum_swingup_study(num_mesh_intervals=25,
                                  scheme="hermite-simpson",
                                  with_path_constraint=False):
    """Double-pendulum swing-up with torque actuators (reference
    testMocoInterface.cpp double pendulum scenarios; the BASELINE config
    adds a MocoControlGoal and optionally a frame-position path
    constraint). Swing from hanging (q=0) to horizontal reach in ~1 s."""
    b = MechModelBuilder(gravity=(0, -9.81, 0))
    b.add_body("link1", mass=1.0, com=(0, -0.5, 0),
               inertia=np.diag([0, 0, 1.0 / 12.0]), joint_name="j0",
               kind="revolute", axis=(0, 0, 1), coord_name="q0")
    b.add_body("link2", mass=1.0, com=(0, -0.5, 0),
               inertia=np.diag([0, 0, 1.0 / 12.0]), parent="link1",
               joint_name="j1", kind="revolute", axis=(0, 0, 1),
               tree_r=(0, -1.0, 0), coord_name="q1")
    mech = b.finalize()
    model = Model(mech)
    model.add_coordinate_actuator("tau0", "q0", optimal_force=1.0,
                                  min_control=-100, max_control=100)
    model.add_coordinate_actuator("tau1", "q1", optimal_force=1.0,
                                  min_control=-100, max_control=100)
    model.finalize()

    prob = Problem(model)
    prob.set_time_bounds(0, 1.0)
    # start hanging at rest; end inverted (tip up): q0 = pi, q1 = 0
    prob.set_state_info("/jointset/j0/q0/value", (-10, 10), 0, np.pi)
    prob.set_state_info("/jointset/j1/q1/value", (-10, 10), 0, 0)
    prob.set_state_info("/jointset/j0/q0/speed", (-50, 50), 0, 0)
    prob.set_state_info("/jointset/j1/q1/speed", (-50, 50), 0, 0)
    prob.add_goal(ControlGoal(name="effort", weight=0.001))
    if with_path_constraint:
        # keep the elbow angle within a range along the path
        def elbow_limit(rep, t, y, x, lam, p):
            return y[rep.state_index("/jointset/j1/q1/value")]

        prob.add_path_constraint("elbow_range", elbow_limit, -2.0, 2.0)

    study = Study(prob)
    study.set_solver_options(transcription_scheme=scheme,
                             num_mesh_intervals=num_mesh_intervals)
    return study


def hanging_muscle_study(num_mesh_intervals=25,
                         ignore_activation_dynamics=False,
                         ignore_tendon_compliance=True,
                         tendon_dynamics_implicit=False,
                         scheme="hermite-simpson",
                         multibody_dynamics_mode="implicit"):
    """Hanging-muscle minimum time (reference
    Moco/Tests/testMocoActuators.cpp:1050-1160 createHangingMuscleModel +
    "Hanging muscle minimum time"): a DeGrooteFregly2016 muscle between the
    ground origin and a 0.5 kg body on a slider aligned with gravity
    (+x, g = +9.81); raise the mass from height 0.15 to 0.14 in minimum
    time."""
    b = MechModelBuilder(gravity=(9.81, 0.0, 0.0))
    b.add_body("body", mass=0.5, joint_name="joint", kind="prismatic",
               axis=(1, 0, 0), coord_name="height")
    mech = b.finalize()
    model = Model(mech)
    params = dgf.default_muscle_params(
        max_isometric_force=30.0, optimal_fiber_length=0.10,
        tendon_slack_length=0.05, pennation_angle_at_optimal=0.1,
        fiber_damping=0.01, tendon_strain_at_one_norm_force=0.10,
        max_contraction_velocity=10.0)
    model.add_muscle("muscle",
                     path=[(-1, (0.0, 0.0, 0.0)), (0, (0.0, 0.0, 0.0))],
                     params=params,
                     ignore_activation_dynamics=ignore_activation_dynamics,
                     ignore_tendon_compliance=ignore_tendon_compliance,
                     tendon_dynamics_implicit=tendon_dynamics_implicit)
    model.finalize()

    prob = Problem(model)
    prob.set_time_bounds(0, (0.05, 1.0))
    prob.set_state_info("/jointset/joint/height/value", (0.14, 0.16), 0.15,
                        0.14)
    prob.set_state_info("/jointset/joint/height/speed", (-1, 1), 0, 0)
    if not ignore_activation_dynamics:
        from .ocp import InitialActivationGoal
        prob.add_goal(InitialActivationGoal(name="initial_activation",
                                            weight=1.0))
    prob.set_control_info("/forceset/muscle", (0.01, 1))
    prob.add_goal(FinalTimeGoal(name="time"))

    study = Study(prob)
    study.set_solver_options(transcription_scheme=scheme,
                             num_mesh_intervals=num_mesh_intervals,
                             multibody_dynamics_mode=multibody_dynamics_mode)
    study.set_ipm_options(tol=1e-4)
    return study
