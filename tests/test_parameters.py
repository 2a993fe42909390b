"""Parameter optimization (MocoParameter analogue).

Mirrors reference Moco/Tests/testMocoParameters.cpp:78-217 (spring-mass
oscillator: optimize body mass so the motion matches an analytic target).
"""

import jax.numpy as jnp
import numpy as np

from opensim_moco_tpu.models import MechModelBuilder
from opensim_moco_tpu.models.model import Model
from opensim_moco_tpu.ocp import CustomGoal, Problem, Study


def test_optimize_oscillator_mass():
    """Spring k=1, q(0)=1, u(0)=0, no forcing: q(t) = cos(sqrt(k/m) t).
    Requiring q(pi) = -1 (half period at t=pi) forces m = 1."""
    k = 1.0
    b = MechModelBuilder(gravity=(0.0, 0.0, 0.0))
    b.add_body("osc", mass=3.0, joint_name="j", kind="prismatic",
               axis=(1, 0, 0), coord_name="q")
    model = Model(b.finalize())
    model.add_spring_generalized_force("spring", "q", stiffness=k)
    model.finalize()

    prob = Problem(model)
    prob.set_time_bounds(0, np.pi)
    prob.set_state_info("/jointset/j/q/value", (-5, 5), 1.0)
    prob.set_state_info("/jointset/j/q/speed", (-5, 5), 0.0)

    def apply_mass(p, theta):
        mech = dict(p["mech"])
        mech["mass"] = mech["mass"].at[0].set(theta)
        out = dict(p)
        out["mech"] = mech
        return out

    prob.add_parameter("osc_mass", (0.1, 10.0), apply_mass,
                       initial_value=3.0)

    def final_pos_error(rep, initial, final, integral, p):
        yf = final[1]
        return (yf[0] - (-1.0)) ** 2 + yf[1] ** 2

    prob.add_goal(CustomGoal(name="endpoint_match",
                             value_fn=final_pos_error))

    study = Study(prob)
    study.set_solver_options(num_mesh_intervals=40)
    study.set_ipm_options(tol=1e-8, max_iter=500)
    sol = study.solve()
    assert sol.success, sol.status
    m_opt = float(sol.parameters[0])
    # q(pi) = cos(pi sqrt(1/m)): matching -1 and udot(pi)=0 -> m = 1
    assert abs(m_opt - 1.0) < 1e-3
    q = sol.state("/jointset/j/q/value")
    np.testing.assert_allclose(q, np.cos(sol.time), atol=2e-3)
