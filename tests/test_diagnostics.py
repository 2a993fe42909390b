"""Objective breakdown + constraint-violation reporting (reference
printObjectiveBreakdown CasOCTranscription.cpp:700-706/1103,
printConstraintValues :723-1102)."""

import numpy as np
import pytest

from opensim_moco_tpu.examples import (double_pendulum_swingup_study,
                                       kirk_min_effort_study)


def test_objective_breakdown_sums_to_objective():
    study = kirk_min_effort_study(num_mesh_intervals=15)
    study.set_ipm_options(tol=1e-7, max_iter=200)
    sol = study.solve()
    assert sol.success
    bd = study.objective_breakdown(sol)
    assert set(bd) == {"effort"}
    np.testing.assert_allclose(sum(bd.values()), sol.objective, rtol=1e-6)


def test_constraint_report_groups_consistent():
    study = double_pendulum_swingup_study(num_mesh_intervals=8)
    study.set_ipm_options(tol=1e-6, max_iter=300)
    sol = study.solve()
    assert sol.success
    rep = study.print_constraint_values(sol)
    assert "hermite_defect" in rep and "simpson_defect" in rep
    # converged solution: all groups nearly satisfied
    assert max(rep.values()) < 1e-5


def test_analyze_outputs_along_solution():
    """Study.analyze (reference MocoStudy::analyze<T>, MocoStudy.h:140):
    output closures evaluated on the solution grid."""
    study = kirk_min_effort_study(num_mesh_intervals=15)
    study.set_ipm_options(tol=1e-7, max_iter=200)
    sol = study.solve()
    assert sol.success

    import jax.numpy as jnp

    tab = study.analyze(sol, {
        "kinetic_energy": lambda rep, t, y, x, lam, p:
            0.5 * jnp.sum(y[rep.model.nq:2 * rep.model.nq] ** 2),
        "control": lambda rep, t, y, x, lam, p: x,
    })
    assert "kinetic_energy" in tab.column_names
    ke = tab.column("kinetic_energy")
    assert np.all(ke >= 0) and np.all(np.isfinite(ke))
    # vector outputs expand to one column per component
    assert any(n.startswith("control") for n in tab.column_names)
    u2 = 0.5 * sol.state("/jointset/j/coord/speed") ** 2
    np.testing.assert_allclose(ke, u2, atol=1e-12)


def test_rank_deficient_constraint_jacobian_warning(caplog):
    """Redundant kinematic constraints trigger the reference's
    rank-deficiency guidance (MocoCasADiSolver.cpp:352-398)."""
    import logging

    import numpy as np

    from opensim_moco_tpu.models import MechModelBuilder
    from opensim_moco_tpu.models.model import Model
    from opensim_moco_tpu.ocp import Problem, Study

    b = MechModelBuilder(gravity=(0.0, -9.81, 0.0))
    b.add_body("l1", mass=1.0, com=(0.5, 0, 0), joint_name="j1",
               kind="revolute", axis=(0, 0, 1), coord_name="q1")
    b.add_body("l2", mass=1.0, com=(0.5, 0, 0), joint_name="j2",
               kind="revolute", axis=(0, 0, 1), parent="l1",
               tree_r=(1.0, 0.0, 0.0), coord_name="q2")
    model = Model(b.finalize())
    model.add_coordinate_actuator("t1", "q1", optimal_force=10)
    import jax.numpy as jnp

    # the same coupler twice: G has 2 identical rows -> rank 1
    for name in ("c1", "c2"):
        model.add_kinematic_constraint(
            name, lambda mp, q: jnp.atleast_1d(q[1] - q[0]))
    model.finalize()

    prob = Problem(model)
    prob.set_time_bounds(0, 0.5)
    study = Study(prob)
    study.set_solver_options(num_mesh_intervals=4,
                             enforce_constraint_derivatives=False)
    tr = study.transcription()
    rep = tr.rep
    Y = np.tile(np.asarray([0.3, 0.3, 0.0, 0.0]), (tr.G, 1))
    with caplog.at_level(logging.WARNING, logger="opensim_moco_tpu"):
        study._check_constraint_jacobian_rank(tr, rep, Y)
    text = caplog.text
    assert "Rank-deficient constraint Jacobian" in text
    assert "minimize_lagrange_multipliers" in text
