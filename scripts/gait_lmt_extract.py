"""Back out the reference's muscle-tendon lengths from the golden solution.

For the 10 tendon-compliant muscles the golden MocoInverse solution fixes
(activation a, normalized tendon force ft, its derivative dft) at every
grid point, and the reference's converged implicit equilibrium residual is
~0 there. The residual is a function r(a, ft, dft, lMT, vMT); solving
r = 0 for lMT recovers the *reference's* muscle-tendon length to high
precision. Comparing with our geometric lMT along the same (golden) q
isolates path-geometry errors muscle by muscle, independent of the solver.

Also reports: our prescribed q/u vs the golden's q/u columns (kinematics
pipeline check), and rigid-tendon muscle force sensitivity.
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


def main():
    study = gait_inverse_study(mesh_interval=0.05)
    tr = study.transcription()
    m = tr.rep.model
    p = tr.rep.apply_parameters(jnp.zeros(0))
    C = tr._prescribed_constants()
    tg = np.asarray(C["t"])  # (G,)

    table = read_sto(GOLDEN)
    t_ref = np.asarray(table.time)
    assert np.allclose(tg, t_ref, atol=1e-9), (tg[:3], t_ref[:3])

    coord_names = list(m.mech.coord_names)
    nq = len(coord_names)

    def col(name):
        return np.asarray(table.column(name))

    # golden q, u by coordinate name
    qg = np.zeros((len(t_ref), nq))
    ug = np.zeros((len(t_ref), nq))
    for cname in table.column_names:
        parts = cname.split("/")
        if cname.endswith("/value"):
            qg[:, coord_names.index(parts[-2])] = col(cname)
        elif cname.endswith("/speed"):
            ug[:, coord_names.index(parts[-2])] = col(cname)

    print("== kinematics pipeline check (ours vs golden columns) ==")
    dq = np.abs(np.asarray(C["q"]) - qg)
    du = np.abs(np.asarray(C["u"]) - ug)
    worst = np.argsort(-dq.max(axis=0))[:6]
    for i in worst:
        print(f"  q {coord_names[i]:24s} max|dq|={dq[:, i].max():.5f} "
              f"max|du|={du[:, i].max():.5f}")
    print(f"  overall max|dq|={dq.max():.5f} max|du|={du.max():.5f}")

    # our lMT, vMT along the GOLDEN kinematics
    @jax.jit
    def lv(q, u):
        return m.muscle_path_kinematics(p, q, u)

    L_ours, V_ours = jax.vmap(lv)(jnp.asarray(qg), jnp.asarray(ug))
    L_ours = np.asarray(L_ours)
    V_ours = np.asarray(V_ours)

    print("\n== implied lMT (compliant muscles) ==")
    mus_names = [ms.name for ms in m.muscles]
    pm = {k: np.asarray(v) for k, v in p["muscles"].items()}
    for mi, ms in enumerate(m.muscles):
        if ms.ignore_tendon_compliance:
            continue
        a = col(f"/forceset/{ms.name}/activation")
        ft = col(f"/forceset/{ms.name}/normalized_tendon_force")
        dft = col(f"/forceset/{ms.name}/implicitderiv_normalized_tendon_force")
        pk = {k: v[mi] for k, v in pm.items()}
        lMopt = pk["optimal_fiber_length"]
        kT = dgf.tendon_kT(pk["tendon_strain_at_one_norm_force"])

        # dense scan in fiber_len_at, pick zero crossing nearest our lMT
        lt = pk["tendon_slack_length"] * np.asarray(
            dgf.tendon_force_length_inverse(jnp.asarray(ft), kT))
        grid = np.linspace(0.02, 2.4, 3000) * lMopt  # fiber_len_at
        lmt_grid = lt[:, None] + grid[None, :]  # (G, N)

        def res_at(lmts, k):
            return dgf.implicit_tendon_residual(
                pk, a[k], ft[k], dft[k], lmts, V_ours[k, mi],
                ignore_passive_fiber_force=True)

        implied = np.zeros(len(t_ref))
        for k in range(len(t_ref)):
            r = np.asarray(res_at(jnp.asarray(lmt_grid[k]), k))
            s = np.where(np.diff(np.sign(r)) != 0)[0]
            if len(s) == 0:
                implied[k] = np.nan
                continue
            # zero crossing closest to our lMT
            cands = []
            for j in s:
                x0, x1 = lmt_grid[k, j], lmt_grid[k, j + 1]
                r0, r1 = r[j], r[j + 1]
                cands.append(x0 - r0 * (x1 - x0) / (r1 - r0))
            cands = np.asarray(cands)
            implied[k] = cands[np.argmin(np.abs(cands - L_ours[k, mi]))]
        d = L_ours[:, mi] - implied
        print(f"  {ms.name:12s} dlMT mm: mean={1e3*np.nanmean(d):+7.2f} "
              f"max|{1e3*np.nanmax(np.abs(d)):6.2f}| "
              f"std={1e3*np.nanstd(d):5.2f}  "
              f"(lMT ours {L_ours[:,mi].min():.3f}..{L_ours[:,mi].max():.3f})")

    print("\n== rigid muscles: our lf_norm + force along golden kinematics ==")
    for mi, ms in enumerate(m.muscles):
        if not ms.ignore_tendon_compliance:
            continue
        a = col(f"/forceset/{ms.name}/activation")
        pk = {k: v[mi] for k, v in pm.items()}
        F = np.asarray(dgf.rigid_tendon_force(
            pk, jnp.asarray(a), jnp.asarray(L_ours[:, mi]),
            jnp.asarray(V_ours[:, mi]), ignore_passive_fiber_force=True))
        lfn = (L_ours[:, mi] - pk["tendon_slack_length"]) / \
            pk["optimal_fiber_length"]
        print(f"  {ms.name:12s} lf_norm {lfn.min():.3f}..{lfn.max():.3f}  "
              f"F {F.min():7.1f}..{F.max():7.1f} N")


if __name__ == "__main__":
    main()
