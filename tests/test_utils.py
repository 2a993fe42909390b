"""Tables, trajectory container, and rollout."""

import io
import os

import jax.numpy as jnp
import numpy as np

from opensim_moco_tpu.utils import (Trajectory, read_sto, rollout,
                                    sto_to_trajectory, trajectory_to_sto,
                                    write_sto)
from opensim_moco_tpu.utils.tables import StoTable

REF_STO = "/root/reference/Moco/Tests/std_testMocoInverse_subject_18musc_solution.sto"


def test_read_reference_golden_sto():
    t = read_sto(REF_STO)
    assert t.metadata["success"] == "true"
    assert abs(float(t.metadata["objective"]) - 1.087741) < 1e-6
    assert len(t.column_names) == int(t.metadata["num_states"]) + \
        int(t.metadata["num_controls"]) + int(t.metadata["num_multipliers"]) \
        + int(t.metadata["num_derivatives"])
    assert t.time[0] == 0.45
    act = t.column("/forceset/bifemsh_r/activation")
    assert abs(act[0] - 0.03372274667379827) < 1e-15


def test_sto_roundtrip(tmp_path):
    tab = StoTable([0.0, 0.1, 0.2], ["a", "b"],
                   [[1, 2], [3, 4], [5, 6]], {"inDegrees": "no"})
    p = tmp_path / "t.sto"
    write_sto(p, tab)
    t2 = read_sto(str(p))
    np.testing.assert_allclose(t2.data, tab.data)
    assert t2.column_names == ["a", "b"]


def test_trajectory_sto_roundtrip(tmp_path):
    from opensim_moco_tpu.utils.trajectory import Solution
    sol = Solution(
        time=np.linspace(0, 1, 5),
        state_names=["/jointset/j/c/value", "/jointset/j/c/speed"],
        states=np.random.default_rng(0).normal(size=(5, 2)),
        control_names=["/forceset/act"],
        controls=np.ones((5, 1)),
        success=True, objective=1.5)
    p = tmp_path / "sol.sto"
    trajectory_to_sto(sol, p)
    back = sto_to_trajectory(str(p))
    assert back.state_names == sol.state_names
    assert back.control_names == sol.control_names
    np.testing.assert_allclose(back.states, sol.states, atol=1e-12)
    assert back.success
    assert abs(back.objective - 1.5) < 1e-12


def test_golden_solution_loads_as_trajectory():
    sol = sto_to_trajectory(REF_STO)
    assert len(sol.state_names) == 70
    assert len(sol.control_names) == 33
    assert sol.success


def test_trajectory_resample_and_rms():
    t = np.linspace(0, 1, 11)
    tr1 = Trajectory(time=t, state_names=["s"], states=np.sin(t)[:, None],
                     control_names=[], controls=np.zeros((11, 0)))
    t2 = np.linspace(0, 1, 31)
    tr2 = Trajectory(time=t2, state_names=["s"], states=np.sin(t2)[:, None],
                     control_names=[], controls=np.zeros((31, 0)))
    rms = tr1.compare_states_rms(tr2)
    assert rms < 2e-3  # linear-interp error of sin on 0.1 grid


def test_rollout_matches_analytic_pendulum():
    """Rollout of the passive pendulum conserves energy / matches small-angle
    period approximately."""
    from opensim_moco_tpu.models import MechModelBuilder
    from opensim_moco_tpu.models.model import Model

    b = MechModelBuilder(gravity=(0, -9.81, 0))
    b.add_body("rod", mass=1.0, com=(0, -1.0, 0), kind="revolute",
               axis=(0, 0, 1), coord_name="theta")
    model = Model(b.finalize()).finalize()
    p = model.default_params()
    tg = np.linspace(0, 2.0, 41)
    X = np.zeros((41, 0))
    y0 = jnp.array([0.1, 0.0])
    ys = rollout(model, p, tg, X, y0, substeps=20)
    # small-angle: theta(t) = 0.1 cos(sqrt(g/l) t)
    expected = 0.1 * np.cos(np.sqrt(9.81) * tg)
    np.testing.assert_allclose(np.asarray(ys[:, 0]), expected, atol=2.5e-3)


def test_pdf_report(tmp_path):
    """Report generation (reference Moco/Bindings/Python/report.py
    analogue): multi-page PDF from the reference golden gait solution,
    with bilateral grouping and a reference overlay."""
    from opensim_moco_tpu.utils.report import generate_report

    sol = sto_to_trajectory(REF_STO)
    ref = read_sto(REF_STO)
    out = tmp_path / "report.pdf"
    generate_report(sol, str(out), labels=["solution"], reference=ref,
                    title="gait inverse")
    data = out.read_bytes()
    assert data[:5] == b"%PDF-"
    assert len(data) > 10_000


def test_cli_report(tmp_path):
    from opensim_moco_tpu.cli import main

    out = tmp_path / "r.pdf"
    rc = main(["report", REF_STO, "--out", str(out), "--title", "t"])
    assert rc == 0
    assert out.read_bytes()[:5] == b"%PDF-"


def test_quintic_resample_beats_linear():
    """Trajectory.resample uses the GCVSpline(5) analogue
    (MocoTrajectory.h:235): on smooth data the quintic resample error is
    orders of magnitude below linear interpolation."""
    t = np.linspace(0, 1, 11)
    tr = Trajectory(time=t, state_names=["s"], states=np.sin(6 * t)[:, None],
                    control_names=[], controls=np.zeros((11, 0)))
    tq = np.linspace(0, 1, 101)
    lin = tr.resample(tq, method="linear")
    qui = tr.resample(tq)
    err_lin = np.max(np.abs(lin.state("s") - np.sin(6 * tq)))
    err_qui = np.max(np.abs(qui.state("s") - np.sin(6 * tq)))
    assert err_qui < err_lin / 5
    # away from the natural-BC boundary layer the quintic is near machine
    interior = (tq > 0.2) & (tq < 0.8)
    err_int = np.max(np.abs(qui.state("s")[interior] - np.sin(6 * tq)[interior]))
    assert err_int < err_lin / 40


def test_visualize_filmstrip_and_gif(tmp_path):
    """Study.visualize renders a stick-figure filmstrip PNG and an
    animated GIF (MocoUtilities.h:258 visualize analogue, headless)."""
    from opensim_moco_tpu.models import MechModelBuilder
    from opensim_moco_tpu.models.model import Model
    from opensim_moco_tpu.utils.visualize import visualize

    b = MechModelBuilder(gravity=(0, -9.81, 0))
    b.add_body("rod", mass=1.0, com=(0, -0.5, 0), kind="revolute",
               axis=(0, 0, 1), coord_name="theta")
    model = Model(b.finalize()).finalize()
    t = np.linspace(0, 1, 12)
    traj = Trajectory(time=t, state_names=model.state_names(),
                      states=np.stack([0.5 * np.sin(2 * t),
                                       np.cos(2 * t)], axis=1),
                      control_names=[], controls=np.zeros((12, 0)))
    png = visualize(model, traj, str(tmp_path / "strip.png"), max_frames=6)
    assert open(png, "rb").read(8).startswith(b"\x89PNG")
    gif = visualize(model, traj, str(tmp_path / "anim.gif"), max_frames=5)
    assert open(gif, "rb").read(6) in (b"GIF87a", b"GIF89a")


def test_generate_accelerations_from_values():
    """generateAccelerationsFromValues analogue (MocoTrajectory.h:405):
    second spline derivative of the value columns."""
    t = np.linspace(0, 1, 21)
    tr = Trajectory(time=t,
                    state_names=["/jointset/j/c/value", "/jointset/j/c/speed"],
                    states=np.stack([np.sin(3 * t), 3 * np.cos(3 * t)],
                                    axis=1),
                    control_names=[], controls=np.zeros((21, 0)))
    out = tr.generate_accelerations_from_values()
    assert out.derivative_names == ["/jointset/j/c/accel"]
    interior = slice(3, -3)
    np.testing.assert_allclose(out.derivatives[interior, 0],
                               -9 * np.sin(3 * t)[interior], atol=0.05)
