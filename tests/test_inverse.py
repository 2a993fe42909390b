"""Prescribed kinematics + Inverse tool.

Mirrors the reference's MocoInverse structure (MocoInverse.cpp:46-117) on
analytically checkable toy problems."""

import numpy as np
import pytest

from opensim_moco_tpu.models import MechModelBuilder
from opensim_moco_tpu.models import muscle as dgf
from opensim_moco_tpu.models.model import Model
from opensim_moco_tpu.tools import Inverse


def test_inverse_single_actuator_matches_inverse_dynamics():
    """With one actuator the control is fully determined:
    x(t) = (m qdd + damping u)/gain. Prescribe q(t) = 0.5 sin(t)."""
    m_val, c_val = 1.7, 0.8
    b = MechModelBuilder(gravity=(0.0, 0.0, 0.0))
    b.add_body("b", mass=m_val, joint_name="j", kind="prismatic",
               axis=(1, 0, 0), coord_name="q")
    model = Model(b.finalize())
    model.add_spring_generalized_force("damper", "q", viscosity=c_val)
    model.add_coordinate_actuator("act", "q", optimal_force=1.0,
                                  min_control=-100, max_control=100)
    times = np.linspace(0, 2.0, 101)
    qs = 0.5 * np.sin(times)[:, None]

    inv = Inverse(model=model, kinematics=(times, qs), mesh_interval=0.05,
                  convergence_tolerance=1e-6)
    sol = inv.solve()
    assert sol.success, sol.status
    t = sol.time
    # F = m qdd + c qdot  (spring applies -c u, actuator must cancel it)
    expected = -m_val * 0.5 * np.sin(t) + c_val * 0.5 * np.cos(t)
    got = sol.control("/forceset/act")
    # interior points (natural-spline end effects pollute the boundaries)
    sl = slice(6, -6)
    np.testing.assert_allclose(got[sl], expected[sl], atol=5e-3)


def test_inverse_muscle_plus_reserve():
    """A DGF muscle (rigid tendon, no activation dynamics) + low-authority
    reserve tracks a slow motion: muscle carries the load."""
    b = MechModelBuilder(gravity=(9.81, 0.0, 0.0))
    b.add_body("b", mass=1.0, joint_name="j", kind="prismatic",
               axis=(1, 0, 0), coord_name="h")
    model = Model(b.finalize())
    params = dgf.default_muscle_params(
        max_isometric_force=100.0, optimal_fiber_length=0.10,
        tendon_slack_length=0.05)
    model.add_muscle("muscle", path=[(-1, (0, 0, 0)), (0, (0, 0, 0))],
                     params=params, ignore_activation_dynamics=True,
                     ignore_tendon_compliance=True)
    model.add_coordinate_actuator("reserve", "h", optimal_force=1.0,
                                  min_control=-10, max_control=10)

    times = np.linspace(0, 1.0, 51)
    qs = (0.15 + 0.005 * np.sin(2 * np.pi * times))[:, None]
    inv = Inverse(model=model, kinematics=(times, qs), mesh_interval=0.05,
                  convergence_tolerance=1e-4, reserves_weight=10.0)
    sol = inv.solve()
    assert sol.success, sol.status
    act = sol.control("/forceset/muscle")
    res = sol.control("/forceset/reserve")
    # gravity load ~9.81 N; muscle front line: activation ~ 0.1 at
    # fl/fv ~ 1; reserve should stay small because it is heavily penalized
    assert np.all(act > 0.02)
    assert np.max(np.abs(res)) < 1.0
    # static check at t=0.25 (peak, near-zero accel/vel):
    # muscle force ~ m*g -> F = 100*(a*fl(lM)*fv + fpas) with lMT=0.155
    assert 0.05 < np.mean(act) < 0.3


def test_prescribed_fold_matches_unfolded():
    """The folded prescribed-kinematics path (per-grid-point constants,
    Model.prescribed_point_constants) must produce bit-identical
    constraints to the general _pointwise path at feasible times."""
    import jax.numpy as jnp

    b = MechModelBuilder(gravity=(9.81, 0.0, 0.0))
    b.add_body("b", mass=1.3, joint_name="j", kind="prismatic",
               axis=(1, 0, 0), coord_name="h")
    model = Model(b.finalize())
    params = dgf.default_muscle_params(
        max_isometric_force=80.0, optimal_fiber_length=0.10,
        tendon_slack_length=0.05)
    model.add_muscle("muscle", path=[(-1, (0, 0, 0)), (0, (0, 0, 0))],
                     params=params, tendon_dynamics_implicit=True)
    model.add_coordinate_actuator("reserve", "h", optimal_force=1.0,
                                  min_control=-10, max_control=10)
    model.add_spring_generalized_force("damper", "h", viscosity=0.3)

    times = np.linspace(0, 1.0, 51)
    qs = (0.15 + 0.005 * np.sin(2 * np.pi * times))[:, None]
    inv = Inverse(model=model, kinematics=(times, qs), mesh_interval=0.1)
    tr = inv.build_study().transcription()
    assert tr.fold_prescribed

    rng = np.random.default_rng(3)
    z = np.asarray(tr.initial_guess())
    z[2:] += 0.05 * rng.standard_normal(tr.n - 2)  # keep pinned t0/tf
    z = jnp.asarray(z)
    c_fold = np.asarray(tr.constraints_fn()(z))
    tr.fold_prescribed = False
    c_ref = np.asarray(tr.constraints_fn()(z))
    np.testing.assert_allclose(c_fold, c_ref, rtol=1e-12, atol=1e-12)
