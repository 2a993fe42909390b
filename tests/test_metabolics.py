"""Bhargava2004 metabolics (mirrors testMocoMetabolics.cpp "basics":
smooth-vs-nonsmooth agreement at steep smoothing, rate signs, clamping)."""

import numpy as np
import pytest

from opensim_moco_tpu.models import metabolics as met


def _rates(v, use_smoothing, **kw):
    return met.metabolic_rates(
        activation=0.8, excitation=0.8, norm_fiber_length=1.0,
        fiber_velocity=v, active_fiber_force=100.0, passive_fiber_force=10.0,
        active_force_length_multiplier=1.0, max_isometric_force=200.0,
        mass=met.muscle_mass(200.0, 0.1),
        use_smoothing=use_smoothing,
        velocity_smoothing=1e6, power_smoothing=1e6,
        heat_rate_smoothing=1e6, **kw)


@pytest.mark.parametrize("v", [-0.3, -0.01, 0.01, 0.25])
@pytest.mark.parametrize("force_dep", [False, True])
@pytest.mark.parametrize("neg_work", [False, True])
def test_smooth_matches_nonsmooth_at_steep_smoothing(v, force_dep, neg_work):
    r_ns = _rates(v, False, use_force_dependent_shortening=force_dep,
                  include_negative_mechanical_work=neg_work)
    r_s = _rates(v, True, use_force_dependent_shortening=force_dep,
                 include_negative_mechanical_work=neg_work)
    for k in r_ns:
        np.testing.assert_allclose(float(r_s[k]), float(r_ns[k]), rtol=1e-4,
                                   atol=1e-6)


def test_rate_signs_and_minimum_heat():
    m = met.muscle_mass(200.0, 0.1)
    # shortening (v < 0) produces positive shortening heat and positive work
    r = _rates(-0.2, False)
    assert float(r["shortening"]) > 0
    assert float(r["mechanical_work"]) > 0
    assert float(r["total"]) > 0
    # lengthening with work excluded: zero work, alpha = 0
    r2 = _rates(0.2, False, include_negative_mechanical_work=False)
    assert abs(float(r2["mechanical_work"])) < 1e-10
    # minimum total heat rate of 1 W/kg enforced
    r3 = met.metabolic_rates(
        activation=0.0, excitation=0.0, norm_fiber_length=1.0,
        fiber_velocity=0.0, active_fiber_force=0.0, passive_fiber_force=0.0,
        active_force_length_multiplier=1.0, max_isometric_force=200.0,
        mass=m)
    np.testing.assert_allclose(float(r3["total"]), m, rtol=1e-12)


def test_muscle_mass_and_basal():
    # m = Fmax/sigma * rho * lMopt (Bhargava2004Metabolics.cpp:96-104)
    m = float(met.muscle_mass(200.0, 0.1))
    np.testing.assert_allclose(m, 200.0 / 0.25e6 * 1059.7 * 0.1, rtol=1e-12)
    assert float(met.basal_rate(75.0)) == pytest.approx(1.2 * 75.0)
