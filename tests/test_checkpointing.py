"""Iterate dumps, warm start, and graceful interrupt (reference
output_interval MocoCasADiSolver.h:138, guess_file
MocoDirectCollocationSolver.h:164, FileDeletionThrower
MocoUtilities.h:717-756)."""

import os

from opensim_moco_tpu.examples import kirk_min_effort_study


def test_checkpoint_and_warm_start(tmp_path):
    study = kirk_min_effort_study(num_mesh_intervals=20)
    study.set_ipm_options(tol=1e-7, max_iter=200)
    ckpt = str(tmp_path / "iterate.sto")
    sol = study.solve(checkpoint_interval=5, checkpoint_path=ckpt)
    assert sol.success
    assert os.path.exists(ckpt)
    guess = study.create_guess_from_file(ckpt)
    sol2 = study.solve(guess=guess)
    assert sol2.success
    assert sol2.num_iterations <= sol.num_iterations + 2
    assert abs(sol2.objective - sol.objective) < 1e-6


def test_interrupt_file_aborts(tmp_path):
    study = kirk_min_effort_study(num_mesh_intervals=20)
    study.set_ipm_options(tol=1e-12, max_iter=10000)  # would run long
    stopfile = tmp_path / "keep_running.txt"
    stopfile.write_text("delete this to stop the optimization")
    stopfile.unlink()  # deleted before solve: abort at first chunk
    sol = study.solve(checkpoint_interval=3, interrupt_file=str(stopfile))
    assert sol.num_iterations <= 6


def test_create_guess_kinds():
    """bounds / random / time-stepping guess generation
    (MocoCasADiSolver.cpp:51-73, createGuessTimeStepping
    MocoSolver.cpp:26)."""
    import numpy as np

    from opensim_moco_tpu.examples import hanging_muscle_study

    study = hanging_muscle_study(10, ignore_tendon_compliance=True,
                                 ignore_activation_dynamics=True)
    tr = study.transcription()
    zb = np.asarray(study.create_guess("bounds"))
    zr = np.asarray(study.create_guess("random", seed=3))
    zt = np.asarray(study.create_guess("time-stepping"))
    assert zb.shape == zr.shape == zt.shape
    assert not np.allclose(zb, zr)
    # time-stepping integrates the dynamics: states differ from the
    # bounds midpoint and respect the state bounds
    lb, ub = tr.bounds()
    o = tr.offsets["states"]
    assert not np.allclose(zt[o[0]:o[1]], zb[o[0]:o[1]])
    assert np.all(zt[o[0]:o[1]] >= lb[o[0]:o[1]] - 1e-12)
    assert np.all(zt[o[0]:o[1]] <= ub[o[0]:o[1]] + 1e-12)
    assert np.all(np.isfinite(zt))
