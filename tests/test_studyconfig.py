"""JSON study documents (.omoco analogue) + CLI `run` plumbing
(reference Executable/opensim-moco.cpp:38-90, .omoco serialization via
RegisterTypes_osimMoco.cpp)."""

import json
import os

import numpy as np
import pytest

from opensim_moco_tpu.utils.studyconfig import dump_config, load_study

REF_TESTS = "/root/reference/Moco/Tests"


def test_inverse_config_roundtrip(tmp_path):
    cfg = {
        "type": "MocoInverse",
        "model": {
            "osim": f"{REF_TESTS}/subject_walk_armless_18musc.osim",
            "weld_joints": ["subtalar_r", "subtalar_l", "mtp_r", "mtp_l"],
            "modops": [
                {"op": "ModOpIgnorePassiveFiberForcesDGF"},
                {"op": "ModOpTendonComplianceDynamicsModeDGF",
                 "mode": "implicit"},
                {"op": "ModOpAddExternalLoads",
                 "xml_path":
                     f"{REF_TESTS}/subject_walk_armless_external_loads.xml"},
            ],
        },
        "kinematics": {
            "file": f"{REF_TESTS}/subject_walk_armless_coordinates.mot",
            "lowpass_hz": 6.0,
        },
        "initial_time": 0.45,
        "final_time": 1.0,
        "mesh_interval": 0.05,
        "convergence_tolerance": 1e-3,
    }
    p = tmp_path / "inverse.json"
    dump_config(cfg, str(p))
    tool, cfg2 = load_study(str(p))
    assert tool.mesh_interval == 0.05
    assert tool.initial_time == 0.45
    model = tool.model
    # welds removed the subtalar/mtp coordinates; muscles set to implicit
    assert "subtalar_angle_r" not in model.mech.coord_names
    assert all(m.tendon_dynamics_implicit for m in model.muscles)
    assert all(m.ignore_passive_fiber_force for m in model.muscles)
    assert len(model.external_forces) == 2
    # kinematics are radians, matched to coordinate order
    times, values = tool.kinematics
    assert values.shape[1] == model.mech.nq
    assert np.max(np.abs(values)) < 10.0  # degrees would be ~60

    study = tool.build_study()
    # the Inverse tool maps user convergence_tolerance (1e-3 default) to
    # tol*1e-2 internally (tools/inverse.py) to match IPOPT's sd/sc-scaled
    # KKT error semantics
    assert study.ipm_options.tol == pytest.approx(1e-5)


def test_track_config(tmp_path):
    cfg = {
        "type": "MocoTrack",
        "model": {
            "osim": "/root/reference/Moco/Examples/C++/example2DWalking/"
                    "2D_gait.osim",
        },
        "states_reference": {
            "file": "/root/reference/Moco/Examples/C++/example2DWalking/"
                    "referenceCoordinates.sto",
        },
        "mesh_interval": 0.05,
        "control_effort_weight": 0.01,
    }
    tool, _ = load_study(cfg)
    assert tool.control_effort_weight == 0.01
    assert len(tool.model.muscles) == 18


def test_unknown_type_and_modop():
    with pytest.raises(ValueError, match="unknown study type"):
        load_study({"type": "MocoNope",
                    "model": {"osim": f"{REF_TESTS}/"
                              "subject_walk_armless_18musc.osim"}})
    with pytest.raises(ValueError, match="unknown ModOp"):
        load_study({
            "type": "MocoTrack",
            "model": {"osim": f"{REF_TESTS}/"
                      "subject_walk_armless_18musc.osim",
                      "modops": [{"op": "ModOpFrobnicate"}]},
            "states_reference": {"file": f"{REF_TESTS}/"
                                 "subject_walk_armless_coordinates.mot"}})


def test_cli_parser_run_subcommand(tmp_path, capsys):
    from opensim_moco_tpu.cli import main
    # bad config path -> argparse/IO error surfaces, not a silent pass
    with pytest.raises(FileNotFoundError):
        main(["run", str(tmp_path / "missing.json")])
