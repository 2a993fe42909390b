"""Canonical example problems = the BASELINE.json configs.

Each builder mirrors one reference example (cited per function) and returns
a ready-to-solve :class:`~opensim_moco_tpu.ocp.study.Study`.
"""

from __future__ import annotations

import numpy as np

from .models import MechModelBuilder
from .models import muscle as dgf
from .models.model import Model
from .ocp import (ControlGoal, FinalTimeGoal, MarkerFinalGoal,
                  PeriodicityGoal, Problem, Study)

REF_2DWALK = "/root/reference/Moco/Examples/C++/example2DWalking"


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
    if not ignore_tendon_compliance:
        # mirror testMocoActuators.cpp:1129-1145: implicit tendon dynamics
        # pairs with MocoInitialVelocityEquilibriumDGFGoal in cost mode
        # (w=0.001); explicit pairs with the force-equilibrium goal
        from .ocp.goals import (InitialForceEquilibriumGoal,
                                InitialVelocityEquilibriumDGFGoal)
        if tendon_dynamics_implicit:
            prob.add_goal(InitialVelocityEquilibriumDGFGoal(
                name="initial_velocity_equilibrium", mode="cost",
                weight=0.001))
        else:
            prob.add_goal(InitialForceEquilibriumGoal(
                name="initial_force_equilibrium"))
    prob.set_control_info("/forceset/muscle", (0.01, 1))
    prob.add_goal(FinalTimeGoal(name="time"))

    study = Study(prob)
    study.set_solver_options(transcription_scheme=scheme,
                             num_mesh_intervals=num_mesh_intervals,
                             multibody_dynamics_mode=multibody_dynamics_mode)
    study.set_ipm_options(tol=1e-4)
    return study


def _gait2d_symmetry_goal(model):
    """Half-cycle symmetry pairs shared by gaitTracking and gaitPrediction
    (example2DWalking.cpp:84-131 and :228-275)."""
    state_pairs = []
    for c in model.coordinate_paths():
        cname = c.split("/")[-1]
        for suffix in ("/value", "/speed"):
            if cname.endswith("_r"):
                state_pairs.append((c + suffix,
                                    c.replace("_r", "_l") + suffix, False))
            elif cname.endswith("_l"):
                state_pairs.append((c + suffix,
                                    c.replace("_l", "_r") + suffix, False))
            elif not cname.endswith("_tx"):
                state_pairs.append((c + suffix, c + suffix, False))
    state_pairs.append(("/jointset/groundPelvis/pelvis_tx/speed",
                        "/jointset/groundPelvis/pelvis_tx/speed", False))
    for m in model.muscles:
        a = f"/forceset/{m.name}/activation"
        if m.name.endswith("_r"):
            state_pairs.append((a, a.replace("_r", "_l"), False))
        elif m.name.endswith("_l"):
            state_pairs.append((a, a.replace("_l", "_r"), False))
    return PeriodicityGoal(name="symmetry", state_pairs=tuple(state_pairs),
                           control_pairs=(("/forceset/lumbarAct",
                                           "/forceset/lumbarAct", False),))


def _gait2d_state_bounds(prob):
    """Coordinate bounds shared by gaitTracking and gaitPrediction
    (example2DWalking.cpp:154-170 and :282-303)."""
    d = np.pi / 180
    prob.set_state_info("/jointset/groundPelvis/pelvis_tilt/value",
                        (-20 * d, -10 * d))
    prob.set_state_info("/jointset/groundPelvis/pelvis_tx/value", (0, 1))
    prob.set_state_info("/jointset/groundPelvis/pelvis_ty/value",
                        (0.75, 1.25))
    for s in ("l", "r"):
        prob.set_state_info(f"/jointset/hip_{s}/hip_flexion_{s}/value",
                            (-10 * d, 60 * d))
        prob.set_state_info(f"/jointset/knee_{s}/knee_angle_{s}/value",
                            (-50 * d, 0))
        prob.set_state_info(f"/jointset/ankle_{s}/ankle_angle_{s}/value",
                            (-15 * d, 25 * d))
    prob.set_state_info("/jointset/lumbar/lumbar/value", (0, 20 * d))


def _gait2d_grf_reference():
    """referenceGRF.sto -> {"Right_GRF"/"Left_GRF": (times, (K,3) forces)}
    for ContactTrackingGoal (example2DWalking.cpp:138-146 tracks
    ground_force_{r,l}_v{x,y,z} with the heel+front sphere groups)."""
    from .utils.tables import read_sto

    grf = read_sto(f"{REF_2DWALK}/referenceGRF.sto")
    times = np.asarray(grf.time)
    ref = {}
    for side, key in (("r", "Right_GRF"), ("l", "Left_GRF")):
        ref[key] = (times, np.stack(
            [grf.column(f"ground_force_{side}_v{ax}") for ax in "xyz"],
            axis=1))
    return ref


def gait2d_tracking_study(num_mesh_intervals=50, state_tracking_weight=10.0,
                          control_effort_weight=10.0, tol=1e-4,
                          max_iterations=1000, grf_tracking_weight=1.0):
    """example2DWalking MocoTrack (reference
    Moco/Examples/C++/example2DWalking/example2DWalking.cpp:55-185
    gaitTracking): 10-DOF, 18-muscle gait tracking over half a gait cycle
    with contact spheres, half-cycle symmetry (periodicity) constraints,
    and GRF tracking (GRFTrackingWeight, example2DWalking.cpp:138-146;
    pass 0 to disable like the reference).

    Returns (study, guess)."""
    import jax.numpy as jnp

    from .tools.track import Track
    from .utils.osim import parse_osim
    from .utils.tables import read_sto

    model, info = parse_osim(f"{REF_2DWALK}/2D_gait.osim")
    model.finalize()

    ref = read_sto(f"{REF_2DWALK}/referenceCoordinates.sto")
    track = Track(model=model, states_reference=ref,
                  states_global_weight=state_tracking_weight,
                  control_effort_weight=control_effort_weight,
                  track_reference_position_derivatives=True,
                  initial_time=0.0, final_time=0.47008941,
                  mesh_interval=0.47008941 / num_mesh_intervals,
                  convergence_tolerance=tol, lowpass_cutoff=6.0,
                  max_iterations=max_iterations)
    study = track.build_study()
    prob = study.problem

    # half-cycle symmetry (example2DWalking.cpp:84-131)
    prob.add_goal(_gait2d_symmetry_goal(model))

    # GRF tracking (example2DWalking.cpp:138-146)
    if grf_tracking_weight:
        from .ocp import ContactTrackingGoal
        prob.add_goal(ContactTrackingGoal(
            name="contact", weight=grf_tracking_weight,
            groups=((("contactHeel_r", "contactFront_r"), "Right_GRF"),
                    (("contactHeel_l", "contactFront_l"), "Left_GRF")),
            reference=_gait2d_grf_reference(),
            # sagittal-plane projection (example2DWalking.cpp:149-151)
            projection="plane", projection_vector=(0.0, 0.0, 1.0)))

    # bounds (example2DWalking.cpp:154-170)
    _gait2d_state_bounds(prob)

    guess = track.make_guess(study)
    return study, guess


def gait2d_prediction_study(num_mesh_intervals=50, desired_speed=1.2,
                            effort_weight=10.0, tol=1e-4,
                            max_iterations=1000, guess=None):
    """example2DWalking gaitPrediction (reference
    example2DWalking.cpp:206-320): de-novo gait prediction — minimize
    cubed control effort over distance subject to half-cycle symmetry and
    a prescribed 1.2 m/s average speed (endpoint constraint), with no
    tracking data.

    Pass ``guess`` (a Trajectory from gait2d_tracking_study's solution, or
    a z-vector) to Study.solve — the reference warm-starts from the
    gaitTracking solution (solver.setGuess(...), example2DWalking.cpp:
    314-315), and a displacement-nonzero guess is effectively required:
    the cold bounds guess has zero COM displacement, where the
    effort-over-distance normalization is ill-conditioned.

    Returns (study, guess) — guess is None when not supplied."""
    from .utils.osim import parse_osim

    model, info = parse_osim(f"{REF_2DWALK}/2D_gait.osim")
    model.finalize()

    prob = Problem(model)
    prob.set_time_bounds(0, (0.4, 0.6))
    prob.add_goal(_gait2d_symmetry_goal(model))
    from .ocp.goals import AverageSpeedGoal
    prob.add_goal(AverageSpeedGoal(name="speed", use_com=True,
                                   desired_speed=desired_speed,
                                   mode="endpoint_constraint"))
    prob.add_goal(ControlGoal(name="effort", weight=effort_weight,
                              exponent=3, divide_by_displacement=True))
    _gait2d_state_bounds(prob)

    study = Study(prob)
    study.set_solver_options(transcription_scheme="hermite-simpson",
                             num_mesh_intervals=num_mesh_intervals)
    study.set_ipm_options(tol=tol, max_iter=max_iterations,
                          hessian_approximation="objective-only")
    if guess is not None and not hasattr(guess, "shape"):
        # a Trajectory (e.g. a tracking Solution): resample onto this grid
        guess = study.transcription().guess_from_trajectory(guess)
    return study, guess


REF_TESTS = "/root/reference/Moco/Tests"
REF_ARCHIVE = "/root/reference/Moco/Archive/Tests"


def gait1018_track_tool(mesh_interval=0.02, initial_time=0.01,
                        final_time=1.3, tol=1e-2,
                        apply_tracked_states_to_guess=True):
    """MocoTrack gait10dof18musc flagship (reference
    Moco/Tests/testMocoTrack.cpp:46-66): torque-driven planar 10-DoF gait
    model (ModOpRemoveMuscles + ModOpAddReserves(100)), measured GRFs as
    external loads, tracking 6 Hz low-passed coordinate values over
    [0.01, 1.3] s at mesh interval 0.02 (MocoTool.cpp:27). The golden
    regression bar is controls/states RMS < 1e-2 vs
    std_testMocoTrackGait10dof18musc_solution.sto.

    Returns the configured Track tool (call .solve() or .build_study())."""
    from .tools.track import Track
    from .utils.osim import parse_external_loads, parse_osim
    from .utils.processors import (ModOpAddReserves, ModOpRemoveMuscles,
                                   filter_lowpass)
    from .utils.tables import read_sto

    model, info = parse_osim(
        f"{REF_ARCHIVE}/testGait10dof18musc_subject01.osim")
    model = ModOpRemoveMuscles()(model)
    model = ModOpAddReserves(100.0)(model)
    for s in parse_external_loads(
            f"{REF_TESTS}/walk_gait1018_subject01_grf.xml"):
        model.add_external_force(s["name"],
                                 info["body_idx"][s["body_name"]],
                                 s["force_fn"], s["point_fn"],
                                 s["torque_fn"])
    model.finalize()

    # states reference: 6 Hz low-pass (testMocoTrack.cpp:54-55), deg->rad
    ref = filter_lowpass(
        read_sto(f"{REF_TESTS}/walk_gait1018_state_reference.mot"), 6.0)
    times = np.asarray(ref.time)
    data = {}
    translational = {"pelvis_tx", "pelvis_ty", "pelvis_tz"}
    for cp in model.coordinate_paths():
        col = np.asarray(ref.column(f"{cp}/value"))
        if ref.in_degrees() and cp.split("/")[-1] not in translational:
            col = np.deg2rad(col)
        data[f"{cp}/value"] = col

    return Track(model=model, states_reference=(times, data),
                 initial_time=initial_time, final_time=final_time,
                 mesh_interval=mesh_interval, convergence_tolerance=tol,
                 apply_tracked_states_to_guess=apply_tracked_states_to_guess)


def gait_inverse_study(mesh_interval=0.05, initial_time=0.45,
                       final_time=1.0, tol=1e-3):
    """MocoInverse on subject_walk_armless (gait10dof18musc-class config;
    reference Moco/Tests/testMocoInverse.cpp:118-147): 3D 21-coordinate
    model (CustomJoints with spline-coupled knees, 16 wrap cylinders),
    18 muscles converted to DGF with implicit tendon compliance and no
    passive fiber forces, measured GRFs applied as external loads, and all
    coordinates prescribed from (6 Hz low-passed) measured kinematics.

    Returns the configured Study (prescribed-kinematics transcription)."""
    from .tools.inverse import Inverse
    from .utils.osim import parse_external_loads, parse_osim
    from .utils.processors import filter_lowpass
    from .utils.tables import read_sto

    model, info = parse_osim(
        f"{REF_TESTS}/subject_walk_armless_18musc.osim",
        weld_joints=("subtalar_r", "subtalar_l", "mtp_r", "mtp_l"))
    # ModOpReplaceMusclesWithDeGrooteFregly2016 (testMocoInverse.cpp:124):
    # parameter mapping is done by the parser; the reference's conversion
    # also DROPS every PathWrapSet (DeGrooteFregly2016Muscle.cpp:
    # 1009-1021), which this op reproduces — the golden solution's
    # muscle-tendon lengths match the wrap-free paths to <0.3 mm.
    from .utils.processors import ModOpReplaceMusclesWithDeGrooteFregly2016
    model = ModOpReplaceMusclesWithDeGrooteFregly2016()(model)
    # ModOpIgnorePassiveFiberForcesDGF + TendonComplianceDynamicsModeDGF
    # (testMocoInverse.cpp:125-127)
    import dataclasses as _dc
    model.muscles = [
        _dc.replace(m, ignore_passive_fiber_force=True,
                    tendon_dynamics_implicit=True)
        for m in model.muscles]

    # external loads (testMocoInverse.cpp:128)
    for s in parse_external_loads(
            f"{REF_TESTS}/subject_walk_armless_external_loads.xml"):
        model.add_external_force(s["name"],
                                 info["body_idx"][s["body_name"]],
                                 s["force_fn"], s["point_fn"],
                                 s["torque_fn"])
    model.finalize()

    # kinematics: 6 Hz low-pass, degrees -> radians for rotational coords
    kin = filter_lowpass(read_sto(
        f"{REF_TESTS}/subject_walk_armless_coordinates.mot"), 6.0)
    translational = {"pelvis_tx", "pelvis_ty", "pelvis_tz"}
    cols = []
    for cn in model.mech.coord_names:
        v = kin.column(cn)
        if kin.in_degrees() and cn not in translational:
            v = np.deg2rad(v)
        cols.append(v)
    values = np.stack(cols, axis=1)

    inv = Inverse(model=model, kinematics=(np.asarray(kin.time), values),
                  initial_time=initial_time, final_time=final_time,
                  mesh_interval=mesh_interval,
                  convergence_tolerance=tol)
    return inv.build_study()
