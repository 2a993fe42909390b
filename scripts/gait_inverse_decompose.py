"""Decompose our inverse-dynamics residual at the golden iterate into
per-muscle / actuator / remainder torque contributions for chosen rows.

Usage: python scripts/gait_inverse_decompose.py [grid ...]
"""
import sys

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from opensim_moco_tpu.examples import gait_inverse_study
from opensim_moco_tpu.utils.tables import sto_to_trajectory

GOLDEN = "/root/reference/Moco/Tests/std_testMocoInverse_subject_18musc_solution.sto"
ROWS = ["hip_flexion_r", "hip_adduction_r", "hip_rotation_r",
        "knee_angle_r", "ankle_angle_r", "hip_flexion_l", "knee_angle_l"]


def main():
    grids = [int(a) for a in sys.argv[1:]] or [16]
    study = gait_inverse_study(mesh_interval=0.05)
    tr = study.transcription()
    golden = sto_to_trajectory(GOLDEN)
    z = tr.guess_from_trajectory(golden)

    m = tr.rep.model
    coord_names = list(m.mech.coord_names)
    p = tr.rep.apply_parameters(jnp.zeros(0))
    C = tr._prescribed_constants()

    t0, tf, Y, X, L, D, Gm, pcs, ecs, theta = tr.unpack(z)

    mus_names = [ms.name for ms in m.muscles]
    act_names = [a.name for a in m.actuators]

    @jax.jit
    def pieces(t, q, u, udot, zz, x, lam):
        res = m.multibody_implicit_residual(p, t, q, u, zz, x, lam, udot)
        F = m.muscle_tendon_forces(p, t, q, u, zz, x)
        R = jax.jacfwd(lambda qq: m.path_lengths(p, qq))(q)  # (nm, nq)
        tau_mus = -F[:, None] * R  # (nm, nq) contribution per muscle
        tau_act = m.tau_controls(p, x)
        return res, tau_mus, tau_act, F

    for g in grids:
        t = jnp.asarray(C["t"][g])
        q = jnp.asarray(C["q"][g])
        u = jnp.asarray(C["u"][g])
        udot = jnp.asarray(C["udot"][g])
        res, tau_mus, tau_act, F = jax.device_get(
            pieces(t, q, u, udot, Y[g], X[g], L[g]))
        print(f"=== grid {g} t={float(t):.3f} ===")
        for rn in ROWS:
            i = coord_names.index(rn)
            contrib = [(float(tau_mus[k, i]), mus_names[k])
                       for k in range(len(mus_names))
                       if abs(tau_mus[k, i]) > 0.25]
            contrib.sort(key=lambda kv: -abs(kv[0]))
            cstr = " ".join(f"{n}:{v:+.1f}" for v, n in contrib[:6])
            print(f"  {rn:18s} res={float(res[i]):+8.3f} "
                  f"act={float(tau_act[i]):+7.2f}  mus[{cstr}]")
        big = [(float(F[k]), mus_names[k]) for k in range(len(mus_names))]
        big.sort(key=lambda kv: -abs(kv[0]))
        print("  forces:", " ".join(f"{n}:{v:.0f}" for v, n in big[:8]))


if __name__ == "__main__":
    main()
