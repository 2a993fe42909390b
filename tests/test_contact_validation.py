"""Contact-force physics validation, independent of the gait goldens.

Mirrors the reference's testContact normal/friction checks
(testContact.cpp:74-199 testNormalForce/testFrictionForce, run for the
AckermannVanDenBogert2010 and EspositoMiller2018 force laws,
testContact.cpp:526-533): a 50 kg 2D point mass dropped onto the plane
settles until the contact force equals its weight, and a mass started at
equilibrium height with horizontal speed slides the analytic friction
distance mu*g rest-distance before stopping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opensim_moco_tpu.models import MechModelBuilder
from opensim_moco_tpu.models.model import Model
from opensim_moco_tpu.utils.rollout import rollout

MASS = 50.0
G = 9.80665
MU = 0.7  # testContact.cpp:28
STIFFNESS = 1e5  # createAVDB/createEspositoMiller, testContact.cpp:503-516
DISSIPATION = 1.0


def point_mass_model(contact_model):
    b = MechModelBuilder(gravity=(0.0, -G, 0.0))
    b.add_body("ptx", mass=0.0, joint_name="tx", kind="prismatic",
               axis=(1, 0, 0), coord_name="tx")
    b.add_body("body", mass=MASS, parent="ptx", joint_name="ty",
               kind="prismatic", axis=(0, 1, 0), coord_name="ty")
    model = Model(b.finalize())
    model.add_station_contact("contact", body=1, location=(0, 0, 0),
                              stiffness=STIFFNESS, dissipation=DISSIPATION,
                              friction_coefficient=MU, model=contact_model)
    model.finalize()
    return model


def contact_force_at(model, y):
    p = model.default_params()
    q = jnp.asarray(y[:2])
    u = jnp.asarray(y[2:])
    f = model.contact_forces(p, jnp.asarray(0.0), q, u)["contact"]
    return np.asarray(f)


@pytest.mark.parametrize("law", ["ackermann", "esposito"])
def test_normal_force_settles_to_weight(law):
    """Drop from 0.5 m; with dissipation the system settles and the contact
    force balances the weight (testContact.cpp:74-155)."""
    model = point_mass_model(law)
    p = model.default_params()
    tg = np.linspace(0.0, 2.0, 201)
    X = np.zeros((201, 0))
    y0 = jnp.asarray([0.0, 0.5, 0.0, 0.0])
    ys = rollout(model, p, tg, X, y0, substeps=200)
    yf = np.asarray(ys[-1])
    f = contact_force_at(model, yf)
    weight = MASS * G
    # reference bars: |fx| < 0.01, fy = weight +- 1%, fz == 0
    assert abs(f[0]) < 0.01
    assert abs(f[1] - weight) < 0.01 * weight
    assert f[2] == 0.0
    # system at rest (|u| < 1e-3, testContact.cpp:497-499)
    np.testing.assert_allclose(yf[2:], 0.0, atol=1e-3)


@pytest.mark.parametrize("law", ["ackermann", "esposito"])
def test_friction_force_sliding_distance(law):
    """From equilibrium height with vx0 = 2.5 m/s, friction brings the mass
    to rest after x = vx0^2/(2 mu g) (testContact.cpp:159-199)."""
    model = point_mass_model(law)
    p = model.default_params()

    # equilibrium height from the normal-force settling rollout
    tg0 = np.linspace(0.0, 2.0, 201)
    ys0 = rollout(model, p, tg0, np.zeros((201, 0)),
                  jnp.asarray([0.0, 0.5, 0.0, 0.0]), substeps=200)
    y_eq = float(np.asarray(ys0[-1])[1])

    vx0 = 2.5
    rest_time = vx0 / (MU * G)
    assert rest_time < 0.5
    expected_x = -0.5 * MU * G * rest_time ** 2 + vx0 * rest_time
    tg = np.linspace(0.0, 0.5, 201)
    ys = rollout(model, p, tg, np.zeros((201, 0)),
                 jnp.asarray([0.0, y_eq, vx0, 0.0]), substeps=200)
    yf = np.asarray(ys[-1])
    # reference bar: final x within 0.005 m, final speeds < 1e-3
    assert abs(yf[0] - expected_x) < 0.005
    np.testing.assert_allclose(yf[2:], 0.0, atol=1e-3)
