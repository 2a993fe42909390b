"""Golden-file regression for the MocoInverse flagship.

Mirrors the reference's acceptance test (testMocoInverse.cpp:118-147):
solve the subject_walk_armless 18-muscle inverse problem from the default
(bounds-midpoint) guess and require states/controls RMS < 1e-2 vs the
shipped golden solution std_testMocoInverse_subject_18musc_solution.sto.

This is the project's primary definition of correctness: the full
pipeline (.osim parsing, DGF conversion semantics incl. wrap dropping,
prescribed-kinematics transcription, implicit tendon dynamics, external
loads, the IPM solver) must reproduce the reference's optimum.
"""

import numpy as np
import pytest

GOLDEN = ("/root/reference/Moco/Tests/"
          "std_testMocoInverse_subject_18musc_solution.sto")


@pytest.mark.slow
def test_gait_inverse_matches_golden():
    import jax.numpy as jnp

    from opensim_moco_tpu.examples import gait_inverse_study
    from opensim_moco_tpu.utils.tables import sto_to_trajectory

    golden = sto_to_trajectory(GOLDEN)
    study = gait_inverse_study(mesh_interval=0.05)
    sol = study.solve()
    assert sol.success

    # reference objective 1.087741 (golden file header); ours may sit
    # slightly lower (tighter KKT tolerance on the same objective)
    assert abs(sol.objective - 1.087741) < 5e-3

    names_s = [n for n in golden.state_names if n in sol.state_names]
    names_c = [n for n in golden.control_names if n in sol.control_names]
    assert len(names_s) == 28 and len(names_c) == 33
    ts = np.linspace(0.45, 1.0, 201)
    a = sol.resample(ts)
    b = golden.resample(ts)
    es = np.stack([a.state(n) - b.state(n) for n in names_s])
    ec = np.stack([a.control(n) - b.control(n) for n in names_c])
    s_rms = float(np.sqrt(np.mean(es ** 2)))
    c_rms = float(np.sqrt(np.mean(ec ** 2)))
    # testMocoInverse.cpp:144-147 acceptance bar
    assert s_rms < 1e-2, s_rms
    assert c_rms < 1e-2, c_rms


def test_golden_point_near_feasible():
    """The golden iterate must evaluate as near-feasible under our model
    (fast non-solve check): defects at solution level, inverse-dynamics
    residual at the measured-data noise floor (<2 N against a ~900 N
    gait), cf. the 23.9 N·m wrap-model bug this pins down."""
    import jax.numpy as jnp

    from opensim_moco_tpu.examples import gait_inverse_study
    from opensim_moco_tpu.utils.tables import sto_to_trajectory

    study = gait_inverse_study(mesh_interval=0.05)
    tr = study.transcription()
    golden = sto_to_trajectory(GOLDEN)
    z = jnp.asarray(tr.guess_from_trajectory(golden))
    rep = tr.constraint_report(z)
    viol = {k: float(np.max(np.abs(v))) for k, v in rep.items()}
    assert viol["hermite_defect"] < 1e-3, viol
    assert viol["simpson_defect"] < 1e-3, viol
    assert viol["dae_residual"] < 2.0, viol
    # the objective function must match the reference's reported optimum
    nlp = tr.make_nlp()
    f = float(nlp.objective(z))
    assert abs(f - 1.087741) < 1e-3, f


GOLDEN_TRACK = ("/root/reference/Moco/Tests/"
                "std_testMocoTrackGait10dof18musc_solution.sto")


def test_gait1018_track_golden_point_objective():
    """Fast check: the MocoTrack gait10dof18musc golden evaluates under
    our NLP at its known objective level, with defects inside the
    reference's 1e-2 constraint tolerance — i.e. our dynamics, external
    loads, tracking table, and goal weights reproduce the reference
    problem (testMocoTrack.cpp:46-66)."""
    import jax.numpy as jnp

    from opensim_moco_tpu.examples import gait1018_track_tool
    from opensim_moco_tpu.utils.tables import sto_to_trajectory

    tool = gait1018_track_tool(mesh_interval=0.02)
    study = tool.build_study()
    tr = study.transcription()
    golden = sto_to_trajectory(GOLDEN_TRACK)
    z = jnp.asarray(tr.guess_from_trajectory(golden))
    rep = tr.constraint_report(z)
    viol = {k: float(np.max(np.abs(v))) for k, v in rep.items()}
    assert viol["hermite_defect"] < 1e-2, viol
    assert viol["simpson_defect"] < 5e-2, viol
    nlp = tr.make_nlp()
    f = float(nlp.objective(z))
    assert 0.015 < f < 0.04, f  # tracking 0.0246 + effort 0.0011


@pytest.mark.slow
def test_gait1018_track_dominates_golden():
    """Solve MocoTrack gait10dof18musc at the reference mesh (0.02 s) and
    require a solution that (a) converges, (b) STRICTLY DOMINATES the
    shipped golden under the problem's own objective, and (c) stays in
    the golden's basin (coordinate values within 0.05 rad RMS).

    Context: the reference's own acceptance test compares controls RMS
    against the golden at IPOPT tolerance 1e-2 (testMocoTrack.cpp:66).
    The golden is NOT a stationary point of the NLP — warm-starting our
    solver AT the golden descends from objective 0.0258 to 0.0013 (20x)
    while staying feasible, with the same reserve effort; the golden is
    an early-stopped IPOPT iterate, reproducible only by replaying
    IPOPT's path. Dominating it on the same problem is the meaningful
    parity statement."""
    import jax.numpy as jnp

    from opensim_moco_tpu.examples import gait1018_track_tool
    from opensim_moco_tpu.utils.tables import sto_to_trajectory

    tool = gait1018_track_tool(mesh_interval=0.02)
    tool.max_iterations = 3000
    study = tool.build_study()
    tr = study.transcription()
    golden = sto_to_trajectory(GOLDEN_TRACK)
    zg = jnp.asarray(tr.guess_from_trajectory(golden))
    nlp = tr.make_nlp()
    f_golden = float(nlp.objective(zg))

    sol = study.solve(guess=jnp.asarray(tool.make_guess(study)))
    assert sol.success
    assert sol.objective < 0.5 * f_golden, (sol.objective, f_golden)

    ts = np.asarray(sol.time)
    tg = np.asarray(golden.time)
    sv = [n for n in golden.state_names if n.endswith("/value")]
    ev = np.stack([np.asarray(sol.state(n)) -
                   np.interp(ts, tg, golden.state(n)) for n in sv])
    assert float(np.sqrt(np.mean(ev ** 2))) < 0.05
