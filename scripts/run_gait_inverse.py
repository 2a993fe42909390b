"""Solve MocoInverse subject_walk_armless and compare vs reference golden.

Mirrors reference Moco/Tests/testMocoInverse.cpp:118-147: solve, then
compareContinuousVariablesRMS vs std_testMocoInverse_subject_18musc_solution.sto
with the RMS < 1e-2 acceptance bar.
"""
import sys
import time

import numpy as np

from opensim_moco_tpu.examples import gait_inverse_study
from opensim_moco_tpu.utils.tables import sto_to_trajectory

GOLDEN = "/root/reference/Moco/Tests/std_testMocoInverse_subject_18musc_solution.sto"


def main():
    mesh = float(sys.argv[1]) if len(sys.argv) > 1 else 0.02
    tol = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-3
    t_start = time.time()
    study = gait_inverse_study(mesh_interval=mesh, tol=tol)
    print(f"[{time.time()-t_start:.1f}s] study built", flush=True)
    sol = study.solve()
    print(f"[{time.time()-t_start:.1f}s] solved: success={sol.success} "
          f"objective={sol.objective:.6f} status={sol.status}", flush=True)
    print("breakdown:", study.objective_breakdown(sol), flush=True)

    golden = sto_to_trajectory(GOLDEN)
    # compare on overlap of named columns, golden's time grid
    common_states = [n for n in golden.state_names if n in sol.state_names]
    common_controls = [n for n in golden.control_names
                       if n in sol.control_names]
    print(f"common states: {len(common_states)}/{len(golden.state_names)}; "
          f"controls: {len(common_controls)}/{len(golden.control_names)}",
          flush=True)
    missing_s = [n for n in golden.state_names if n not in sol.state_names]
    missing_c = [n for n in golden.control_names
                 if n not in sol.control_names]
    if missing_s:
        print("missing states:", missing_s[:8], flush=True)
    if missing_c:
        print("missing controls:", missing_c[:8], flush=True)
    ours = sol.resample(np.asarray(golden.time))
    rms_s = ours.compare_states_rms(golden, names=common_states)
    rms_c = ours.compare_controls_rms(golden, names=common_controls)
    print(f"states RMS vs golden: {rms_s:.5f}", flush=True)
    print(f"controls RMS vs golden: {rms_c:.5f}", flush=True)
    # per-column worst offenders
    errs = []
    for n in common_states:
        a = ours.state(n)
        b = golden.state(n)
        errs.append((float(np.sqrt(np.mean((a - b) ** 2))), n))
    for e, n in sorted(errs, reverse=True)[:10]:
        print(f"  {e:.5f}  {n}", flush=True)
    print(f"PASS={rms_s < 1e-2 and rms_c < 1e-2}", flush=True)


if __name__ == "__main__":
    main()
