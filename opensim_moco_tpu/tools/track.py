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
    control_effort_weight: float = 0.001
    initial_time: float | None = None
    final_time: float | None = None
    mesh_interval: float = 0.02
    convergence_tolerance: float = 1e-2
    max_iterations: int = 2000
    lowpass_cutoff: float | None = None  # Hz

    def _reference_dict(self):
        ref = self.states_reference
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
        if not self.apply_tracked_states_to_guess:
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
        t0 = self.initial_time if self.initial_time is not None else times[0]
        tf = self.final_time if self.final_time is not None else times[-1]
        model = self.model
        if not model._finalized:
            model.finalize()

        prob = Problem(model)
        prob.set_time_bounds(t0, tf)
        goal = StateTrackingGoal(
            name="state_tracking", weight=self.states_global_weight,
            reference={n: (times, v) for n, v in data.items()},
            state_weights=dict(self.states_weights),
            scale_by_range=self.scale_state_weights_with_range)
        prob.add_goal(goal)
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
