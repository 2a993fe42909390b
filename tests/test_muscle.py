"""DeGrooteFregly2016 muscle curves and dynamics.

Value checks mirror reference testMocoActuators.cpp ("DeGrooteFregly2016Muscle
basics") and the documented curve properties in
DeGrooteFregly2016Muscle.h:329-478."""

import jax
import jax.numpy as jnp
import numpy as np

from opensim_moco_tpu.models import muscle as dgf


def test_active_force_length_peak():
    # b-constants were chosen so that f(1) = 1 (h:767-768 comment).
    assert abs(float(dgf.active_force_length(1.0)) - 1.0) < 1e-12
    # symmetric-ish falloff, positive everywhere in [0.2, 1.8]
    x = jnp.linspace(0.2, 1.8, 50)
    vals = dgf.active_force_length(x)
    assert (np.asarray(vals) > 0).all()
    assert float(jnp.max(vals)) <= 1.0 + 2e-3  # peak is ~1.001 near x=1


def test_force_velocity_endpoints():
    # d1/d4 were solved so the curve passes through (-1, 0) and (0, 1)
    # (h:802-806 comment); range documented [0, 1.794] (h:362-363).
    assert abs(float(dgf.force_velocity(-1.0))) < 1e-12
    assert abs(float(dgf.force_velocity(0.0)) - 1.0) < 1e-12
    assert abs(float(dgf.force_velocity(1.0)) - 1.794) < 1e-3


def test_force_velocity_inverse_roundtrip():
    v = jnp.linspace(-0.99, 0.99, 41)
    fv = dgf.force_velocity(v)
    v2 = dgf.force_velocity_inverse(fv)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-10)


def test_passive_force_length():
    # zero at the minimum norm fiber length 0.2, 1 at 1 + e0 (h:383-405)
    e0 = 0.6
    assert abs(float(dgf.passive_force_length(0.2, e0))) < 1e-12
    assert abs(float(dgf.passive_force_length(1.0 + e0, e0)) - 1.0) < 1e-12


def test_tendon_force_multiplier():
    kT = dgf.tendon_kT(0.049)
    # c2 == c3 == 1.0/0.2 chosen so f(1) = 0 (h:789-798 comment)
    assert abs(float(dgf.tendon_force_multiplier(1.0, kT))) < 1e-12
    # strain at one norm force: f(1 + e0t) = 1
    assert abs(float(dgf.tendon_force_multiplier(1.049, kT)) - 1.0) < 1e-10
    # inverse round trip
    f = jnp.linspace(0.01, 1.5, 20)
    lT = dgf.tendon_force_length_inverse(f, kT)
    f2 = dgf.tendon_force_multiplier(lT, kT)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f), atol=1e-12)


def test_activation_dynamics_signs_and_rates():
    # activation grows toward excitation, decays away from it
    assert float(dgf.activation_dynamics(1.0, 0.0)) > 0
    assert float(dgf.activation_dynamics(0.0, 1.0)) < 0
    assert abs(float(dgf.activation_dynamics(0.5, 0.5))) < 1e-12
    # activation (e > a) uses the fast time constant: rate roughly
    # (e - a) / (tau_act * (0.5 + 1.5 a)) for e >> a
    rate = float(dgf.activation_dynamics(1.0, 0.0, 0.015, 0.060))
    assert rate > 20.0  # ~ 1/(0.015*0.5) * something near (f+0.5)≈0.55


def test_rigid_tendon_equilibrium_value():
    p = dgf.default_muscle_params(max_isometric_force=100.0,
                                  optimal_fiber_length=0.1,
                                  tendon_slack_length=0.2)
    # at optimal fiber length, zero velocity, full activation:
    # force = Fmax * (1*1*1 + fpas(1.0))
    lMT = 0.2 + 0.1
    f = float(dgf.rigid_tendon_force(p, 1.0, lMT, 0.0))
    fpas = float(dgf.passive_force_length(1.0, 0.6))
    np.testing.assert_allclose(f, 100.0 * (1.0 + fpas), rtol=1e-12)


def test_explicit_implicit_tendon_consistency():
    """The explicit dFt/dt and the implicit residual agree: plugging the
    explicit derivative into the implicit residual gives ~0."""
    p = dgf.default_muscle_params(max_isometric_force=50.0,
                                  optimal_fiber_length=0.08,
                                  tendon_slack_length=0.15,
                                  fiber_damping=0.0)
    act, ft, lMT, vMT = 0.7, 0.4, 0.25, 0.05
    dft = dgf.explicit_tendon_dynamics(p, act, ft, lMT, vMT)
    res = dgf.implicit_tendon_residual(p, act, ft, dft, lMT, vMT)
    assert abs(float(res)) < 1e-9


def test_vectorized_over_muscles():
    ps = dgf.stack_muscle_params([
        dgf.default_muscle_params(max_isometric_force=10.0),
        dgf.default_muscle_params(max_isometric_force=20.0),
    ])
    f = dgf.rigid_tendon_force(ps, jnp.array([1.0, 1.0]),
                               jnp.array([0.3, 0.3]), jnp.array([0.0, 0.0]))
    assert f.shape == (2,)
    np.testing.assert_allclose(np.asarray(f)[1] / np.asarray(f)[0], 2.0,
                               rtol=1e-12)


def test_curves_are_differentiable():
    g = jax.grad(lambda x: dgf.active_force_length(x))(1.0)
    assert np.isfinite(g)
    g2 = jax.grad(lambda v: dgf.force_velocity(v))(0.0)
    assert g2 > 0  # monotonically increasing
