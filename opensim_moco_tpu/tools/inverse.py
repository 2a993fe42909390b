"""Inverse tool: muscle activity from observed kinematics.

MocoInverse analogue (reference Moco/Moco/MocoInverse.{h,cpp}):
prescribes all coordinates via PositionMotion built from a kinematics
table (MocoInverse.cpp:46-96), builds a control-effort problem
(excitation_effort + optional reserves, MocoInverse.cpp:91-101), and
solves with implicit dynamics + auxiliary-derivative minimization
(MocoInverse.cpp:104-117).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ocp import ControlGoal, InitialActivationGoal, Problem, Study
from ..ocp.goals import SumSquaredStateGoal


@dataclasses.dataclass
class Inverse:
    """Configure + run an inverse problem. ``kinematics`` is
    (times (K,), values (K, nq)) in the model's coordinate order (radians),
    or an StoTable whose columns match coordinate value paths."""

    model: object = None
    kinematics: object = None
    initial_time: float | None = None
    final_time: float | None = None
    mesh_interval: float = 0.02  # s (reference MocoInverse default)
    convergence_tolerance: float = 1e-3  # MocoInverse.cpp:38-39
    reserves_weight: float = 1.0
    minimize_sum_squared_activations: bool = False
    max_iterations: int = 2000

    def _kinematics_arrays(self):
        kin = self.kinematics
        if hasattr(kin, "column_names"):  # StoTable
            names = [f"{c}/value" for c in self.model.coordinate_paths()]
            vals = np.stack([kin.column(n) for n in names], axis=1)
            return np.asarray(kin.time), vals
        times, values = kin
        return np.asarray(times), np.asarray(values)

    def build_study(self) -> Study:
        times, values = self._kinematics_arrays()
        # project dependent coupled coordinates onto the constraint
        # manifold, q_dep(t) = f(q_ind(t)) — the reference gets this from
        # assembling the StatesTrajectory (MocoInverse.cpp:63-66); raw
        # .mot tables often carry stale/mis-unit dependent columns
        if getattr(self.model, "couplers", None):
            values = np.array(values, copy=True)
            for (di, ii, fn) in self.model.couplers:
                values[:, di] = np.asarray(
                    [float(fn(v)) for v in values[:, ii]])
        t0 = self.initial_time if self.initial_time is not None else times[0]
        tf = self.final_time if self.final_time is not None else times[-1]
        model = self.model
        model.set_position_motion_from_table(times, values)
        model.finalize()

        prob = Problem(model)
        prob.set_time_bounds(t0, tf)
        effort = ControlGoal(name="excitation_effort")
        # down-weight nothing by default; reserves get their own weight via
        # pattern (reference MocoInverse reserves handling)
        if self.reserves_weight != 1.0:
            effort.pattern_weights = {".*reserve.*": self.reserves_weight}
        prob.add_goal(effort)
        if any(not m.ignore_activation_dynamics for m in model.muscles):
            prob.add_goal(InitialActivationGoal(name="initial_activation"))
        if self.minimize_sum_squared_activations:
            prob.add_goal(SumSquaredStateGoal(
                name="activation_effort", pattern=".*activation"))

        study = Study(prob)
        n_int = max(2, int(round((tf - t0) / self.mesh_interval)))
        study.set_solver_options(
            transcription_scheme="hermite-simpson",
            num_mesh_intervals=n_int,
            interpolate_control_midpoints=False,  # MocoInverse.cpp:107
            minimize_implicit_auxiliary_derivatives=True,
            implicit_auxiliary_derivatives_weight=0.01,  # MocoInverse.cpp:110
        )
        # objective-only curvature: the reference's MocoInverse never sees
        # exact constraint curvature either (forward finite differences +
        # IPOPT limited-memory BFGS, MocoInverse.cpp:112 and
        # MocoDirectCollocationSolver.h:121); dropping it shrinks the XLA
        # graph by an order of magnitude on muscle-rich gait models.
        # Our IPM's KKT-error scaling is stricter than IPOPT's sd/sc
        # normalization, so the user-facing tolerance maps to tol/100
        # internally; mu_init 1e-2 keeps the cold bounds-midpoint start in
        # the golden-solution basin (validated by the
        # testMocoInverse-golden regression, tests/test_gait_golden.py)
        study.set_ipm_options(tol=self.convergence_tolerance * 1e-2,
                              max_iter=self.max_iterations,
                              mu_init=1e-2,
                              hessian_approximation="objective-only")
        return study

    def solve(self):
        return self.build_study().solve()
