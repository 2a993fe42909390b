"""Evaluate the reference golden MocoInverse solution under OUR model.

Builds the gait_inverse_study transcription, injects the golden
trajectory (std_testMocoInverse_subject_18musc_solution.sto) as an
iterate, and reports our objective breakdown + worst constraint groups.

If the golden point is (near-)feasible here, our model matches and any
activation RMS gap is solver/objective-side; if it violates specific
constraint groups (a muscle's implicit tendon residual, a coordinate's
inverse-dynamics row), those name the modeling discrepancy.
"""
import sys

import numpy as np

from opensim_moco_tpu.examples import gait_inverse_study
from opensim_moco_tpu.utils.tables import sto_to_trajectory

GOLDEN = "/root/reference/Moco/Tests/std_testMocoInverse_subject_18musc_solution.sto"


def main():
    mesh = float(sys.argv[1]) if len(sys.argv) > 1 else 0.05
    study = gait_inverse_study(mesh_interval=mesh)
    tr = study.transcription()
    golden = sto_to_trajectory(GOLDEN)

    z = tr.guess_from_trajectory(golden)
    print("objective(golden under ours):", flush=True)
    for k, v in tr.objective_breakdown(z).items():
        print(f"  {k:40s} {float(v):+.6f}")
    rep = tr.constraint_report(z)
    print("constraint groups (max |violation|):")
    for name, v in sorted(rep.items(), key=lambda kv: -np.max(np.abs(kv[1]))):
        print(f"  {np.max(np.abs(v)):12.4e}  {name}")


if __name__ == "__main__":
    main()
