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
