"""BASELINE.json example configs end-to-end.

Mirrors reference tests: sliding mass (exampleSlidingMass.cpp), hanging
muscle minimum time (testMocoActuators.cpp:1088), double-pendulum swing-up
(testMocoInterface.cpp double-pendulum scenarios)."""

import numpy as np
import pytest

from opensim_moco_tpu.examples import (double_pendulum_swingup_study,
                                       hanging_muscle_study,
                                       sliding_mass_study)


def test_sliding_mass_min_time():
    """Bang-bang analytic optimum: tf = 2 sqrt(d m / F) = 0.4 s."""
    study = sliding_mass_study(50, "trapezoidal")
    sol = study.solve()
    assert sol.success, sol.status
    assert abs(sol.final_time - 0.4) < 2e-3
    # bang-bang control: +50 then -50 with one switch at tf/2
    u = sol.control("/forceset/actuator")
    assert u[2] > 45.0
    assert u[-3] < -45.0


def test_double_pendulum_swingup():
    study = double_pendulum_swingup_study(25)
    study.set_ipm_options(tol=1e-6, max_iter=300)
    sol = study.solve()
    assert sol.success, sol.status
    q0 = sol.state("/jointset/j0/q0/value")
    assert abs(q0[0]) < 1e-6
    assert abs(q0[-1] - np.pi) < 1e-6


def test_hanging_muscle_min_time_rigid_tendon():
    study = hanging_muscle_study(25, ignore_tendon_compliance=True,
                                 ignore_activation_dynamics=True)
    study.set_ipm_options(tol=1e-4, max_iter=400)
    sol = study.solve()
    assert sol.success, sol.status
    # analytic two-phase estimate: pull at ~Fmax then brake on gravity
    # gives tf ~= 0.051 s
    assert 0.048 < sol.final_time < 0.06
    h = sol.state("/jointset/joint/height/value")
    assert abs(h[0] - 0.15) < 1e-6
    assert abs(h[-1] - 0.14) < 1e-6


@pytest.mark.slow
def test_hanging_muscle_with_activation_and_tendon():
    study = hanging_muscle_study(25, ignore_tendon_compliance=False)
    study.set_ipm_options(tol=1e-4, max_iter=900)
    sol = study.solve()
    assert sol.success, sol.status
    assert 0.048 < sol.final_time < 0.08
