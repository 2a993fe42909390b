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
