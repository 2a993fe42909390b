"""Tracking tool: solve for controls that reproduce reference states.

MocoTrack analogue (reference Moco/Moco/MocoTrack.{h,cpp}): builds a
MocoStateTrackingGoal from a (filtered) reference table with optional
1/range^2 weight scaling (MocoTrack.cpp:146-234), adds a low-weight
control-effort goal (0.001 default, MocoTrack.cpp:93), and solves at a
loose tolerance (1e-2, MocoTrack.cpp:110-111)."""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ocp import ControlGoal, Problem, Study
from ..ocp.goals import StateTrackingGoal


@dataclasses.dataclass
class Track:
    model: object = None
    # (times (K,), {state_name: values (K,)}) or StoTable with state columns
    states_reference: object = None
    states_weights: dict = dataclasses.field(default_factory=dict)
    scale_state_weights_with_range: bool = False
    track_reference_position_derivatives: bool = False
    states_global_weight: float = 1.0
    # marker tracking (reference markers_reference / markers_weight_set /
    # markers_global_tracking_weight, MocoTrack.h:208-230 and
    # MocoTrack.cpp:235-270): a TrcTable or a path to a .trc file
    markers_reference: object = None
    markers_weights: dict = dataclasses.field(default_factory=dict)
    markers_global_weight: float = 1.0
    allow_unused_references: bool = False
    control_effort_weight: float = 0.001
    initial_time: float | None = None
    final_time: float | None = None
    mesh_interval: float = 0.02
    convergence_tolerance: float = 1e-2
    max_iterations: int = 2000
    lowpass_cutoff: float | None = None  # Hz

    def _markers_dict(self):
        """(model_markers, reference, weights) for MarkerTrackingGoal, or
        None when no markers reference is set. Pairs the model MarkerSet
        with the TRC columns like the reference's MarkersReference
        (MocoTrack.cpp:235-270); frames where a marker is occluded (NaN)
        are dropped per-marker."""
        if self.markers_reference is None:
            return None
        ref = self.markers_reference
        if isinstance(ref, str):
            from ..utils.tables import read_trc
            ref = read_trc(ref)
        if not self.model._finalized:
            self.model.finalize()
        model_markers = dict(getattr(self.model, "markers", {}))
        unused = [n for n in ref.marker_names if n not in model_markers]
        if unused and not self.allow_unused_references:
            raise ValueError(
                "markers reference contains markers absent from the model "
                f"MarkerSet: {unused[:5]}{'...' if len(unused) > 5 else ''} "
                "(set allow_unused_references=True to ignore, like the "
                "reference's allow_unused_references property)")
        markers = {}
        reference = {}
        for name in ref.marker_names:
            if name not in model_markers:
                continue
            pos = ref.marker(name)  # (K, 3)
            ok = ~np.any(np.isnan(pos), axis=1)
            if not np.any(ok):
                continue
            markers[name] = model_markers[name]
            reference[name] = (ref.time[ok], pos[ok])
        return markers, reference, dict(self.markers_weights)

    def _reference_dict(self):
        ref = self.states_reference
        if ref is None:
            return None, None
        if hasattr(ref, "column_names"):  # StoTable
            from ..utils.processors import filter_lowpass
            if self.lowpass_cutoff:
                ref = filter_lowpass(ref, self.lowpass_cutoff)
            times = ref.time
            data = {n: ref.column(n) for n in ref.column_names}
        else:
            times, data = ref
            times = np.asarray(times)
        if not self.model._finalized:
            self.model.finalize()
        model_states = set(self.model.state_names())
        data = {n: v for n, v in data.items() if n in model_states}
        if self.track_reference_position_derivatives:
            # derive speeds from values by finite differences
            # (MocoTrack track_reference_position_derivatives property)
            for name in list(data):
                if name.endswith("/value"):
                    sname = name[:-6] + "/speed"
                    if sname not in data and sname in model_states:
                        data[sname] = np.gradient(np.asarray(data[name]),
                                                  times)
        return times, data

    apply_tracked_states_to_guess: bool = True

    def make_guess(self, study: Study):
        """Bounds-midpoint guess with the tracked states splatted in
        (MocoTrack apply_tracked_states_to_guess, MocoTrack.cpp:117-131)."""
        import numpy as np
        tr = study.transcription()
        z = np.array(tr.initial_guess())
        if not self.apply_tracked_states_to_guess or \
                self.states_reference is None:
            return z
        times, data = self._reference_dict()
        t0, tf = z[0], z[1]
        ts = t0 + (tf - t0) * np.asarray(tr.taus)
        o = tr.offsets["states"]
        Y = z[o[0]:o[1]].reshape(tr.G, tr.ny)
        for name, vals in data.items():
            if name in tr.rep.state_names:
                i = tr.rep.state_names.index(name)
                Y[:, i] = np.interp(ts, times, np.asarray(vals))
        z[o[0]:o[1]] = Y.ravel()
        return z

    def build_study(self) -> Study:
        times, data = self._reference_dict()
        marker_cfg = self._markers_dict()
        if times is None and marker_cfg is None:
            raise ValueError("Track requires a states_reference and/or a "
                             "markers_reference (MocoTrack.cpp:76-83)")
        # time window: intersection of the data ranges, like
        # MocoTool::updateTimeInfo called per reference (MocoTrack.cpp:223,
        # :262)
        t0s, tfs = [], []
        if times is not None:
            t0s.append(times[0])
            tfs.append(times[-1])
        if marker_cfg is not None:
            mtimes = [t for (t, _) in marker_cfg[1].values()]
            t0s.append(max(t[0] for t in mtimes))
            tfs.append(min(t[-1] for t in mtimes))
        t0 = self.initial_time if self.initial_time is not None \
            else max(t0s)
        tf = self.final_time if self.final_time is not None \
            else min(tfs)
        model = self.model
        if not model._finalized:
            model.finalize()

        prob = Problem(model)
        prob.set_time_bounds(t0, tf)
        if times is not None:
            goal = StateTrackingGoal(
                name="state_tracking", weight=self.states_global_weight,
                reference={n: (times, v) for n, v in data.items()},
                state_weights=dict(self.states_weights),
                scale_by_range=self.scale_state_weights_with_range)
            prob.add_goal(goal)
        if marker_cfg is not None:
            from ..ocp.goals import MarkerTrackingGoal
            markers, reference, weights = marker_cfg
            prob.add_goal(MarkerTrackingGoal(
                name="marker_tracking", weight=self.markers_global_weight,
                markers=markers, reference=reference,
                marker_weights=weights))
        if self.control_effort_weight:
            prob.add_goal(ControlGoal(name="control_effort",
                                      weight=self.control_effort_weight))

        study = Study(prob)
        # ceil, mirroring MocoTool::updateTimeInfo (MocoTool.cpp:69)
        n_int = max(2, int(np.ceil((tf - t0) / self.mesh_interval - 1e-12)))
        study.set_solver_options(transcription_scheme="hermite-simpson",
                                 num_mesh_intervals=n_int)
        # limited-memory curvature is the reference's default for DC
        # solvers (MocoDirectCollocationSolver.h:121); exact Lagrangian
        # Hessians on muscle-rich tracking models blow up XLA compile time.
        # The user-facing tolerance (reference default 1e-2,
        # MocoTrack.cpp:110-111) maps to tol/100 internally — our KKT
        # scaling is stricter than IPOPT's, and at raw 1e-2 the
        # acceptable-level exit fires on unconverged iterates
        study.set_ipm_options(tol=self.convergence_tolerance * 1e-2,
                              max_iter=self.max_iterations,
                              mu_init=1e-2,
                              hessian_approximation="objective-only")
        return study

    def solve(self):
        study = self.build_study()
        import jax.numpy as jnp
        return study.solve(guess=jnp.asarray(self.make_guess(study)))
