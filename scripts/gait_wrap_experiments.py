"""Iterate on wrap-geometry variants against the golden-residual metric.

Evaluates the inverse-dynamics residual rows at the golden iterate for the
right-hip coordinates (isolating psoas_r's wrap path) and the implied-lMT
errors for the compliant wrapped muscles (med_gas, semimem) under
different wrap implementations. Run after editing models/wrap.py.
"""
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from opensim_moco_tpu.examples import gait_inverse_study
from opensim_moco_tpu.models import muscle as dgf
from opensim_moco_tpu.utils.tables import read_sto

GOLDEN = "/root/reference/Moco/Tests/std_testMocoInverse_subject_18musc_solution.sto"


def build():
    study = gait_inverse_study(mesh_interval=0.05)
    tr = study.transcription()
    m = tr.rep.model
    p = tr.rep.apply_parameters(jnp.zeros(0))
    table = read_sto(GOLDEN)
    coord_names = list(m.mech.coord_names)
    nq = len(coord_names)
    G = len(np.asarray(table.time))
    qg = np.zeros((G, nq))
    ug = np.zeros((G, nq))
    for cname in table.column_names:
        if cname.endswith("/value"):
            qg[:, coord_names.index(cname.split("/")[-2])] = np.asarray(
                table.column(cname))
        elif cname.endswith("/speed"):
            ug[:, coord_names.index(cname.split("/")[-2])] = np.asarray(
                table.column(cname))
    return study, tr, m, p, table, coord_names, qg, ug


def implied_lmt_errors(m, p, table, qg, ug, muscles=None):
    """dict name -> (mean_mm, max_mm) over grid for compliant muscles."""
    L_ours, V_ours = jax.vmap(lambda q, u: m.muscle_path_kinematics(p, q, u))(
        jnp.asarray(qg), jnp.asarray(ug))
    L_ours = np.asarray(L_ours)
    V_ours = np.asarray(V_ours)
    pm = {k: np.asarray(v) for k, v in p["muscles"].items()}
    out = {}
    for mi, ms in enumerate(m.muscles):
        if ms.ignore_tendon_compliance:
            continue
        if muscles and ms.name not in muscles:
            continue
        a = np.asarray(table.column(f"/forceset/{ms.name}/activation"))
        ft = np.asarray(
            table.column(f"/forceset/{ms.name}/normalized_tendon_force"))
        dft = np.asarray(table.column(
            f"/forceset/{ms.name}/implicitderiv_normalized_tendon_force"))
        pk = {k: v[mi] for k, v in pm.items()}
        kT = dgf.tendon_kT(pk["tendon_strain_at_one_norm_force"])
        lt = pk["tendon_slack_length"] * np.asarray(
            dgf.tendon_force_length_inverse(jnp.asarray(ft), kT))
        grid = np.linspace(0.02, 2.4, 3000) * pk["optimal_fiber_length"]
        implied = np.zeros(len(a))
        for k in range(len(a)):
            lmts = jnp.asarray(lt[k] + grid)
            r = np.asarray(dgf.implicit_tendon_residual(
                pk, a[k], ft[k], dft[k], lmts, V_ours[k, mi],
                ignore_passive_fiber_force=True))
            s = np.where(np.diff(np.sign(r)) != 0)[0]
            if len(s) == 0:
                implied[k] = np.nan
                continue
            cands = np.asarray([
                lt[k] + grid[j] - r[j] * (grid[j + 1] - grid[j]) /
                (r[j + 1] - r[j]) for j in s])
            implied[k] = cands[np.argmin(np.abs(cands - L_ours[k, mi]))]
        d = (L_ours[:, mi] - implied) * 1e3
        out[ms.name] = (float(np.nanmean(d)), float(np.nanmax(np.abs(d))))
    return out


def residual_rows(tr, m, p, rows=("hip_flexion_r", "hip_adduction_r",
                                 "hip_rotation_r", "knee_angle_r",
                                 "ankle_angle_r", "knee_angle_l")):
    import dataclasses

    from opensim_moco_tpu.utils.tables import sto_to_trajectory
    golden = sto_to_trajectory(GOLDEN)
    z = tr.guess_from_trajectory(golden)
    C = tr._prescribed_constants()
    t0, tf, Y, X, L, D, Gm, pcs, ecs, theta = tr.unpack(z)
    coord_names = list(m.mech.coord_names)

    @jax.jit
    def res_fn(t, q, u, udot, zz, x, lam):
        return m.multibody_implicit_residual(p, t, q, u, zz, x, lam, udot)

    G = len(np.asarray(C["t"]))
    R = np.zeros((G, len(coord_names)))
    for g in range(G):
        R[g] = np.asarray(res_fn(
            jnp.asarray(C["t"][g]), jnp.asarray(C["q"][g]),
            jnp.asarray(C["u"][g]), jnp.asarray(C["udot"][g]),
            Y[g], X[g], L[g]))
    out = {c: float(np.abs(R[:, coord_names.index(c)]).max()) for c in rows}
    out["__max__"] = float(np.abs(R).max())
    return out


def main():
    study, tr, m, p, table, coord_names, qg, ug = build()
    print("implied-lMT errors (mm, mean/max):")
    for k, v in implied_lmt_errors(m, p, table, qg, ug).items():
        print(f"  {k:12s} {v[0]:+7.2f} / {v[1]:6.2f}")
    print("residual rows (max |N.m| over grid):")
    for k, v in residual_rows(tr, m, p).items():
        print(f"  {k:16s} {v:8.3f}")


if __name__ == "__main__":
    main()
