"""End-to-end: Kirk 1998 second-order linear min effort.

The reference's primary analytic regression (testMocoAnalytic.cpp:57-100
"Second order linear min effort", tolerance 1e-5 against Kirk eq.
5.1-69/70) and the exampleSlidingMass config from BASELINE.json.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from opensim_moco_tpu.models import MechModelBuilder
from opensim_moco_tpu.models.model import Model
from opensim_moco_tpu.ocp import ControlGoal, Problem, Study


def kirk_expected(time):
    """Kirk 1998 eq. 5.1-69/70 (testMocoAnalytic.cpp:29-56)."""
    e = np.exp
    A = np.array([
        [-2 - 0.5 * e(-2) + 0.5 * e(2), 1 - 0.5 * e(-2) - 0.5 * e(2)],
        [-1 + 0.5 * e(-2) + 0.5 * e(2), 0.5 * e(-2) - 0.5 * e(2)],
    ])
    b = np.array([5.0, 2.0])
    c2, c3 = np.linalg.solve(A, b)
    x0 = c2 * (-time - 0.5 * e(-time) + 0.5 * e(time)) + \
        c3 * (1 - 0.5 * e(-time) - 0.5 * e(time))
    x1 = c2 * (-1 + 0.5 * e(-time) + 0.5 * e(time)) + \
        c3 * (0.5 * e(-time) - 0.5 * e(time))
    return np.stack([x0, x1], axis=1)


def build_problem():
    b = MechModelBuilder(gravity=(0.0, 0.0, 0.0))
    b.add_body("b", mass=1.0, joint_name="j", kind="prismatic",
               axis=(1, 0, 0), coord_name="coord")
    mech = b.finalize()
    model = Model(mech)
    # damper with negative viscosity => F = +u (testMocoAnalytic.cpp:70-72)
    model.add_spring_generalized_force("damper", "coord", viscosity=-1.0)
    model.add_coordinate_actuator("actuator", "coord", optimal_force=1.0)
    model.finalize()

    prob = Problem(model)
    prob.set_time_bounds(0, 2)
    prob.set_state_info("/jointset/j/coord/value", (-10, 10), 0, 5)
    prob.set_state_info("/jointset/j/coord/speed", (-10, 10), 0, 2)
    prob.set_control_info("/forceset/actuator", (-50, 50))
    prob.add_goal(ControlGoal(name="effort", weight=0.5))
    return prob


@pytest.mark.parametrize("scheme", ["trapezoidal", "hermite-simpson"])
def test_kirk_second_order_min_effort(scheme):
    study = Study(build_problem())
    study.set_solver_options(transcription_scheme=scheme,
                             num_mesh_intervals=50)
    study.set_ipm_options(tol=1e-7, max_iter=300)
    sol = study.solve()
    assert sol.success, sol.status
    expected = kirk_expected(sol.time)
    # trapezoidal carries O(h^2) discretization error at 50 intervals; the
    # reference's 1e-5 check runs the default hermite-simpson scheme
    tol = 1e-5 if scheme == "hermite-simpson" else 5e-3
    np.testing.assert_allclose(sol.states[:, :2], expected, atol=tol)


def test_solution_sealing():
    study = Study(build_problem())
    study.set_solver_options(num_mesh_intervals=10)
    study.set_ipm_options(tol=1e-7, max_iter=2)  # guaranteed to fail
    sol = study.solve()
    assert not sol.success
    with pytest.raises(Exception):
        sol.state("/jointset/j/coord/value")
    sol.unseal()
    sol.state("/jointset/j/coord/value")
