"""Tracking tool (MocoTrack analogue) on a toy problem.

Reference strategy: testMocoTrack.cpp tracks gait kinematics and checks
RMS vs golden; here we track a known actuated motion and require recovery
of both states and the generating control."""

import numpy as np

from opensim_moco_tpu.models import MechModelBuilder
from opensim_moco_tpu.models.model import Model
from opensim_moco_tpu.tools import Track
from opensim_moco_tpu.utils.processors import (TableProcessor,
                                               TabOpLowPassFilter,
                                               filter_lowpass)
from opensim_moco_tpu.utils.tables import StoTable


def test_track_recovers_reference_motion():
    """Point mass driven by F(t) = sin(2 pi t): track the resulting motion
    and recover the control."""
    m = 1.0
    b = MechModelBuilder(gravity=(0.0, 0.0, 0.0))
    b.add_body("b", mass=m, joint_name="j", kind="prismatic", axis=(1, 0, 0),
               coord_name="q")
    model = Model(b.finalize())
    model.add_coordinate_actuator("act", "q", optimal_force=1.0,
                                  min_control=-10, max_control=10)
    model.finalize()

    # analytic motion under F = sin(2 pi t), q(0)=u(0)=0:
    # u(t) = (1 - cos(2 pi t)) / (2 pi), q(t) = t/(2pi) - sin(2 pi t)/(2pi)^2
    w = 2 * np.pi
    times = np.linspace(0, 1.0, 101)
    q_ref = times / w - np.sin(w * times) / w ** 2
    u_ref = (1 - np.cos(w * times)) / w

    track = Track(model=model,
                  states_reference=(times, {"/jointset/j/q/value": q_ref,
                                            "/jointset/j/q/speed": u_ref}),
                  states_global_weight=10.0,
                  control_effort_weight=0.0001,
                  mesh_interval=0.025,
                  convergence_tolerance=1e-5)
    sol = track.solve()
    assert sol.success, sol.status
    np.testing.assert_allclose(sol.state("/jointset/j/q/value"),
                               np.interp(sol.time, times, q_ref), atol=2e-3)
    u = sol.control("/forceset/act")
    np.testing.assert_allclose(u[3:-3], np.sin(w * sol.time)[3:-3], atol=5e-2)


def test_table_processor_lowpass():
    t = np.linspace(0, 1, 201)
    clean = np.sin(2 * np.pi * t)
    noisy = clean + 0.05 * np.sin(2 * np.pi * 40 * t)
    tab = StoTable(t, ["x"], noisy[:, None])
    out = (TableProcessor(tab) | TabOpLowPassFilter(6.0)).process()
    # interior (filtfilt has modest edge effects)
    assert np.max(np.abs(out.column("x") - clean)[20:-20]) < 0.01
    assert np.max(np.abs(out.column("x") - clean)) < 0.05
