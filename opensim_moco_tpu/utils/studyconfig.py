"""Serializable study configurations (the .omoco round-trip analogue).

The reference serializes whole MocoStudy / MocoTrack / MocoInverse setups
to XML .omoco files through the OpenSim property system and runs them with
`opensim-moco run <file>` (reference Executable/opensim-moco.cpp:38-90,
RegisterTypes_osimMoco.cpp). This framework's native document is JSON: a
tool type, a model pipeline (.osim source + ModOps), data references, and
solver settings. ``load_study`` reconstructs a ready-to-solve tool/Study;
``dump_config``/``normalize`` round-trip documents.
"""

from __future__ import annotations

import json
import os

import numpy as np

_MODOPS = (
    "ModOpAddReserves", "ModOpIgnoreActivationDynamics",
    "ModOpIgnoreTendonCompliance", "ModOpIgnorePassiveFiberForcesDGF",
    "ModOpTendonComplianceDynamicsModeDGF", "ModOpScaleMaxIsometricForce",
    "ModOpReplaceMusclesWithDeGrooteFregly2016", "ModOpRemoveMuscles",
    "ModOpFiberDampingDGF", "ModOpScaleActiveFiberForceCurveWidthDGF",
    "ModOpPassiveFiberStrainAtOneNormForceDGF", "ModOpAddExternalLoads",
    "ModOpReplaceJointsWithWelds",
)


def _build_model(spec, base_dir):
    from .osim import parse_osim
    from .. import utils

    path = spec["osim"]
    if not os.path.isabs(path):
        path = os.path.join(base_dir, path)
    model, info = parse_osim(path,
                             gravity=spec.get("gravity"),
                             weld_joints=tuple(spec.get("weld_joints", ())))
    ops = []
    from ..utils import processors as P
    for op_spec in spec.get("modops", ()):
        op_spec = dict(op_spec)
        name = op_spec.pop("op")
        if name not in _MODOPS:
            raise ValueError(f"unknown ModOp {name!r}; known: {_MODOPS}")
        factory = getattr(P, name)
        # path-like args resolve relative to the config file
        for key in ("xml_path",):
            if key in op_spec and not os.path.isabs(op_spec[key]):
                op_spec[key] = os.path.join(base_dir, op_spec[key])
        ops.append(factory(**op_spec))
    proc = P.ModelProcessor(model)
    for op in ops:
        proc = proc | op
    return proc.process()


def _load_table(spec, base_dir):
    from .tables import read_sto
    from .processors import filter_lowpass

    path = spec["file"] if isinstance(spec, dict) else spec
    if not os.path.isabs(path):
        path = os.path.join(base_dir, path)
    table = read_sto(path)
    if isinstance(spec, dict) and spec.get("lowpass_hz"):
        table = filter_lowpass(table, float(spec["lowpass_hz"]))
    return table


def load_study(config_or_path):
    """Build a ready-to-solve tool from a JSON study document.

    Returns (tool_or_study, config): for type MocoInverse/MocoTrack the
    tool object (call .solve() or .build_study()); the normalized config
    is returned alongside for provenance.
    """
    if isinstance(config_or_path, str):
        base_dir = os.path.dirname(os.path.abspath(config_or_path))
        with open(config_or_path) as f:
            cfg = json.load(f)
    else:
        cfg = dict(config_or_path)
        base_dir = cfg.pop("_base_dir", os.getcwd())

    kind = cfg.get("type")
    model = _build_model(cfg["model"], base_dir)

    common = {k: cfg[k] for k in ("initial_time", "final_time",
                                  "mesh_interval",
                                  "convergence_tolerance",
                                  "max_iterations") if k in cfg}

    if kind == "MocoInverse":
        from ..tools.inverse import Inverse

        kin = _load_table(cfg["kinematics"], base_dir)
        # tables in degrees -> radians on rotational coordinates
        translational = set(cfg.get("translational_coordinates",
                                    ("pelvis_tx", "pelvis_ty", "pelvis_tz")))
        cols = []
        for cn in model.mech.coord_names:
            v = kin.column(cn) if cn in kin.column_names else \
                kin.column(f"/jointset/{cn}/value")
            if kin.in_degrees() and cn not in translational:
                v = np.deg2rad(v)
            cols.append(v)
        values = np.stack(cols, axis=1)
        tool = Inverse(model=model,
                       kinematics=(np.asarray(kin.time), values),
                       reserves_weight=cfg.get("reserves_weight", 1.0),
                       **common)
        return tool, cfg

    if kind == "MocoTrack":
        from ..tools.track import Track

        ref = _load_table(cfg["states_reference"], base_dir) \
            if "states_reference" in cfg else None
        markers = None
        if "markers_reference" in cfg:
            from .tables import read_trc
            mpath = cfg["markers_reference"]["file"]
            if not os.path.isabs(mpath):
                mpath = os.path.join(base_dir, mpath)
            markers = read_trc(mpath)
        tool = Track(model=model, states_reference=ref,
                     markers_reference=markers,
                     markers_weights=cfg.get("markers_weights", {}),
                     markers_global_weight=cfg.get("markers_global_weight",
                                                   1.0),
                     allow_unused_references=cfg.get(
                         "allow_unused_references", False),
                     states_weights=cfg.get("states_weights", {}),
                     scale_state_weights_with_range=cfg.get(
                         "scale_state_weights_with_range", False),
                     track_reference_position_derivatives=cfg.get(
                         "track_reference_position_derivatives", False),
                     control_effort_weight=cfg.get("control_effort_weight",
                                                   0.001),
                     lowpass_cutoff=cfg.get("lowpass_cutoff"),
                     **common)
        return tool, cfg

    raise ValueError(f"unknown study type {kind!r} "
                     "(expected MocoInverse or MocoTrack)")


def dump_config(cfg, path):
    """Write a normalized study document (stable key order)."""
    with open(path, "w") as f:
        json.dump(cfg, f, indent=2, sort_keys=True)
        f.write("\n")
