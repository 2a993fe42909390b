"""MultivariatePolynomialFunction, station-contact variants, new ModOps,
and trajectory container operations (reference
Components/MultivariatePolynomialFunction.h:28-120,
Components/StationPlaneContactForce.h:77-313, ModelOperators.h:29-335,
MocoTrajectory.h:98-738)."""

import jax
import jax.numpy as jnp
import numpy as np

from opensim_moco_tpu.models.functions import (MultivariatePolynomialFunction,
                                               _exponent_table)
from opensim_moco_tpu.models.model import (esposito_miller_contact_force,
                                           meyer_fregly_contact_force)
from opensim_moco_tpu.utils.trajectory import Trajectory


def test_polynomial_exponent_ordering_matches_reference():
    """The documented dimension=3, order=3 table
    (MultivariatePolynomialFunction.h:36-57)."""
    E = _exponent_table(3, 3)
    expected = [
        (0, 0, 0), (0, 0, 1), (0, 0, 2), (0, 0, 3),
        (0, 1, 0), (0, 1, 1), (0, 1, 2), (0, 2, 0), (0, 2, 1), (0, 3, 0),
        (1, 0, 0), (1, 0, 1), (1, 0, 2), (1, 1, 0), (1, 1, 1), (1, 2, 0),
        (2, 0, 0), (2, 0, 1), (2, 1, 0), (3, 0, 0)]
    assert [tuple(r) for r in E] == expected


def test_polynomial_value_and_grad():
    # f(x, y) = 2 + 3y + 5xy + x^2   (dim 2, order 2)
    # ordering: (0,0),(0,1),(0,2),(1,0),(1,1),(2,0)
    f = MultivariatePolynomialFunction([2.0, 3.0, 0.0, 0.0, 5.0, 1.0], 2, 2)
    x = jnp.array([1.5, -0.7])
    val = float(f(x))
    assert abs(val - (2 + 3 * -0.7 + 5 * 1.5 * -0.7 + 1.5 ** 2)) < 1e-12
    g = jax.grad(lambda xx: f(xx))(x)
    np.testing.assert_allclose(np.asarray(g),
                               [5 * -0.7 + 2 * 1.5, 3 + 5 * 1.5], atol=1e-12)


def test_meyer_fregly_contact_smooth_and_signs():
    pos = jnp.array([-0.01, -0.005, 0.0])
    vel = jnp.array([0.3, -0.1, 0.0])
    f = np.asarray(meyer_fregly_contact_force(pos, vel, 1e4, 1e-2, 1.0))
    assert f[1] > 0.0  # compression
    assert f[0] < 0.0  # friction opposes +x sliding
    # far above the ground, force ~ 0 and must stay finite (log-cosh tail)
    f2 = np.asarray(meyer_fregly_contact_force(
        jnp.array([0.0, 0.5, 0.0]), vel, 1e4, 1e-2, 1.0))
    assert np.isfinite(f2).all() and abs(f2[1]) < 60.0


def test_esposito_miller_contact():
    pos = jnp.array([0.0, -0.01, 0.0])
    vel = jnp.array([-0.2, 0.0, 0.0])
    f = np.asarray(esposito_miller_contact_force(pos, vel, 2e6, 1.0, 1.0,
                                                 0.05, 0.001))
    # quadratic spring: ~ 2e6 * depth^2 (+ void term)
    assert abs(f[1] - (2e6 * 0.01 ** 2 + 1.0 * 0.01)) / f[1] < 0.05
    assert f[0] > 0.0  # friction opposes -x sliding
    # out of contact: only the small void term remains
    f2 = np.asarray(esposito_miller_contact_force(
        jnp.array([0.0, 0.02, 0.0]), vel, 2e6, 1.0, 1.0, 0.05, 0.001))
    assert f2[1] < 0.0 and abs(f2[1]) < 1.0


def test_modops_dgf_properties():
    from opensim_moco_tpu.models import MechModelBuilder
    from opensim_moco_tpu.models.model import Model
    from opensim_moco_tpu.utils.processors import (
        ModelProcessor, ModOpFiberDampingDGF,
        ModOpPassiveFiberStrainAtOneNormForceDGF, ModOpRemoveMuscles,
        ModOpReplaceMusclesWithDeGrooteFregly2016,
        ModOpScaleActiveFiberForceCurveWidthDGF)

    def build():
        b = MechModelBuilder()
        b.add_body("b", mass=1.0, joint_name="j", kind="prismatic",
                   axis=(0, 1, 0), coord_name="h")
        m = Model(b.finalize())
        m.add_muscle("mus", path=[(-1, (0, 0, 0)), (0, (0, 0, 0))],
                     ignore_activation_dynamics=True,
                     ignore_tendon_compliance=True)
        return m

    m = (ModelProcessor(build())
         | ModOpReplaceMusclesWithDeGrooteFregly2016()
         | ModOpFiberDampingDGF(0.01)
         | ModOpScaleActiveFiberForceCurveWidthDGF(1.5)
         | ModOpPassiveFiberStrainAtOneNormForceDGF(0.3)).process()
    mp = m._muscle_params[0]
    assert float(mp["fiber_damping"]) == 0.01
    assert float(mp["active_force_width_scale"]) == 1.5
    assert float(mp["passive_fiber_strain_at_one_norm_force"]) == 0.3

    m2 = (ModelProcessor(build()) | ModOpRemoveMuscles()).process()
    assert not m2.muscles and not m2._muscle_params


def test_trajectory_ops():
    t = np.linspace(0, 2.0, 41)
    names = ["/jointset/j/q/value", "/jointset/j/q/speed"]
    states = np.stack([np.sin(t), np.zeros_like(t)], axis=1)
    tr = Trajectory(time=t, state_names=names, states=states,
                    control_names=["/forceset/a"],
                    controls=np.cos(t)[:, None])

    sp = tr.generate_speeds_from_values()
    np.testing.assert_allclose(sp.state(names[1]), np.cos(t), atol=2e-2)

    acc = sp.generate_accelerations_from_speeds()
    assert acc.derivative_names == ["/jointset/j/q/accel"]
    # natural-spline end effects pollute the boundary samples
    np.testing.assert_allclose(acc.derivatives[5:-5, 0], -np.sin(t)[5:-5],
                               rtol=0, atol=5e-2)

    r = tr.randomize_add(scale=0.05, seed=3)
    assert np.max(np.abs(r.states - tr.states)) <= 0.05
    assert not np.allclose(r.states, tr.states)

    assert tr.is_compatible(names, ["/forceset/a"], require_all=True)
    assert not tr.is_compatible(names + ["missing"], [], require_all=True)
    assert tr.is_numerically_equal(tr)
    assert not tr.is_numerically_equal(r)
