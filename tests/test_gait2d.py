"""example2DWalking MocoTrack (the flagship BASELINE config).

Fast checks run in the regular suite; the full solve is marked slow
(reference example2DWalking.cpp:55-185; tracking bar adapted from
testMocoTrack.cpp RMS < 1e-2 at 50 mesh intervals — here 10 intervals)."""

import numpy as np
import pytest

from opensim_moco_tpu.examples import REF_2DWALK, gait2d_tracking_study
from opensim_moco_tpu.utils.tables import read_sto


def test_gait2d_problem_builds_and_evaluates():
    import jax.numpy as jnp

    study, guess = gait2d_tracking_study(num_mesh_intervals=5)
    tr = study.transcription()
    assert tr.ny == 38  # 10 q + 10 u + 18 activations
    assert tr.nx == 19  # lumbar + 18 excitations
    nlp = tr.make_nlp()
    c = nlp.constraints(jnp.asarray(guess))
    f = nlp.objective(jnp.asarray(guess))
    assert bool(jnp.all(jnp.isfinite(c)))
    assert np.isfinite(float(f))
    # symmetry goal contributes endpoint equalities
    names = [n for n, _ in tr.constraint_group_info()]
    assert "endpoint:symmetry" in names


@pytest.mark.slow
def test_gait2d_tracking_solves():
    study, guess = gait2d_tracking_study(num_mesh_intervals=10,
                                         max_iterations=400)
    study.set_ipm_options(tol=1e-4, max_iter=400,
                          hessian_approximation="objective-only")
    sol = study.solve(guess=guess)
    assert sol.success, sol.status
    ref = read_sto(f"{REF_2DWALK}/referenceCoordinates.sto")
    errs = []
    for n in ref.column_names:
        if n in sol.state_names:
            r = np.interp(sol.time, ref.time, ref.column(n))
            errs.append(np.sqrt(np.mean((sol.state(n) - r) ** 2)))
    assert np.sqrt(np.mean(np.square(errs))) < 0.03  # coarse-mesh bar
    # half-cycle symmetry
    hl = sol.state("/jointset/hip_l/hip_flexion_l/value")
    hr = sol.state("/jointset/hip_r/hip_flexion_r/value")
    assert abs(hl[-1] - hr[0]) < 1e-5


@pytest.mark.slow
def test_gait2d_tracking_full_resolution():
    """Parity at the reference's own resolution: 2D-walking MocoTrack at
    50 mesh intervals (example2DWalking.cpp:66 set_num_mesh_intervals(50))
    with the reference acceptance bar states RMS < 1e-2
    (testMocoTrack.cpp:66)."""
    study, guess = gait2d_tracking_study(num_mesh_intervals=50,
                                         max_iterations=1000)
    study.set_ipm_options(tol=1e-4, max_iter=1000,
                          hessian_approximation="objective-only")
    sol = study.solve(guess=guess)
    assert sol.success, sol.status
    ref = read_sto(f"{REF_2DWALK}/referenceCoordinates.sto")
    errs = []
    for n in ref.column_names:
        if n in sol.state_names:
            r = np.interp(sol.time, ref.time, ref.column(n))
            errs.append(np.sqrt(np.mean((sol.state(n) - r) ** 2)))
    rms = np.sqrt(np.mean(np.square(errs)))
    assert rms < 1e-2, rms
    # half-cycle symmetry at full resolution
    hl = sol.state("/jointset/hip_l/hip_flexion_l/value")
    hr = sol.state("/jointset/hip_r/hip_flexion_r/value")
    assert abs(hl[-1] - hr[0]) < 1e-5
