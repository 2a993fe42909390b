"""TRC marker-file parsing and the MocoTrack marker-tracking path
(reference MocoTrack.cpp:235-270, TRCFileAdapter format)."""

import numpy as np
import pytest

TRC = "/root/reference/Moco/Examples/C++/example3DWalking/marker_trajectories.trc"
OSIM = "/root/reference/Moco/Examples/C++/example3DWalking/subject_walk_armless.osim"


def test_read_trc_reference_file():
    from opensim_moco_tpu.utils.tables import read_trc

    t = read_trc(TRC)
    assert t.metadata["Units"] == "mm"
    assert len(t.marker_names) == 41
    assert t.positions.shape == (238, 41, 3)
    assert t.time[0] == 0.0 and abs(t.time[-1] - 2.37) < 1e-12
    # mm -> m conversion: walking data sits within a few meters of origin
    assert np.nanmax(np.abs(t.positions)) < 5.0
    r_asis = t.marker("R.ASIS")
    assert r_asis.shape == (238, 3)
    np.testing.assert_allclose(r_asis[0], [-0.567049, 1.021099, -0.129947],
                               atol=1e-9)


def test_osim_markerset_parsed():
    from opensim_moco_tpu.utils.osim import parse_osim

    model, info = parse_osim(OSIM)
    assert len(model.markers) == 29
    body, loc = model.markers["R.ASIS"]
    assert body == info["body_idx"]["pelvis"]
    np.testing.assert_allclose(loc, (0.0161802, 0.03005, 0.153262),
                               atol=1e-9)


def test_track_marker_goal_wiring():
    """Track with a markers_reference builds a MarkerTrackingGoal whose
    integrand evaluates finitely, pairing model MarkerSet stations with
    TRC columns (MocoTrack.cpp:235)."""
    import jax.numpy as jnp

    from opensim_moco_tpu.tools import Track
    from opensim_moco_tpu.utils.osim import parse_osim
    from opensim_moco_tpu.utils.tables import read_trc

    model, _ = parse_osim(OSIM)
    trc = read_trc(TRC)
    tool = Track(model=model, markers_reference=trc,
                 markers_weights={"R.ASIS": 10.0},
                 allow_unused_references=True,
                 mesh_interval=0.5)
    markers, reference, weights = tool._markers_dict()
    assert set(markers) <= set(model.markers)
    assert len(markers) >= 25
    assert weights["R.ASIS"] == 10.0

    study = tool.build_study()
    goals = {g.name: g for g in study.problem.goals}
    assert "marker_tracking" in goals
    g = goals["marker_tracking"]
    rep = study.problem.create_rep()
    p = model.default_params()
    y = jnp.zeros(len(rep.state_names))
    x = jnp.zeros(len(rep.control_names))
    val = g.integrand(rep, jnp.asarray(0.5), y, x, jnp.zeros(0), p)
    assert np.isfinite(float(val)) and float(val) > 0.0


def test_track_requires_some_reference():
    from opensim_moco_tpu.tools import Track

    from opensim_moco_tpu.models import MechModelBuilder
    from opensim_moco_tpu.models.model import Model

    b = MechModelBuilder(gravity=(0, -9.81, 0))
    b.add_body("b", mass=1.0, kind="prismatic", axis=(1, 0, 0),
               coord_name="x")
    model = Model(b.finalize()).finalize()
    with pytest.raises(ValueError):
        Track(model=model).build_study()


def test_track_unused_marker_errors():
    from opensim_moco_tpu.tools import Track
    from opensim_moco_tpu.utils.osim import parse_osim
    from opensim_moco_tpu.utils.tables import TrcTable

    model, _ = parse_osim(OSIM)
    trc = TrcTable([0.0, 1.0], ["NOT_A_MARKER"],
                   np.zeros((2, 1, 3)))
    tool = Track(model=model, markers_reference=trc)
    with pytest.raises(ValueError, match="NOT_A_MARKER"):
        tool.build_study()


def test_studyconfig_marker_tracking(tmp_path):
    """A MocoTrack JSON study document with only a markers_reference loads
    into a marker-tracking Track tool (the .omoco markers path,
    MocoTrack.h:208)."""
    from opensim_moco_tpu.utils.studyconfig import load_study

    cfg = {
        "type": "MocoTrack",
        "model": {"osim": OSIM},
        "markers_reference": {"file": TRC},
        "markers_global_weight": 2.5,
        "allow_unused_references": True,
        "mesh_interval": 0.5,
    }
    tool, _ = load_study(cfg)
    assert tool.markers_global_weight == 2.5
    study = tool.build_study()
    assert any(g.name == "marker_tracking" for g in study.problem.goals)
