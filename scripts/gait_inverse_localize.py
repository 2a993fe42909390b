"""Localize which dae_residual rows the golden solution violates.

Slices the dae_residual constraint group at the golden iterate into
(grid point, row) and reports the worst coordinates/muscles and times.
"""
import numpy as np

from opensim_moco_tpu.examples import gait_inverse_study
from opensim_moco_tpu.utils.tables import sto_to_trajectory

GOLDEN = "/root/reference/Moco/Tests/std_testMocoInverse_subject_18musc_solution.sto"


def main():
    study = gait_inverse_study(mesh_interval=0.05)
    tr = study.transcription()
    golden = sto_to_trajectory(GOLDEN)
    z = tr.guess_from_trajectory(golden)

    import jax
    c = np.asarray(jax.device_get(jax.jit(tr.make_nlp().constraints)(z)))
    # find the dae_residual slice
    off = 0
    for name, size in tr.constraint_group_info():
        if name == "dae_residual":
            break
        off += size
    G = tr.G
    n_alg = size // G
    dae = c[off:off + size].reshape(G, n_alg)
    nq = tr.nq
    coord_names = list(tr.rep.model.mech.coord_names)
    zeta_names = [m for (m, kind) in tr.rep.model._aux_index
                  if kind == "normalized_tendon_force"]
    names = coord_names[:nq] + [f"tendon:{n}" for n in zeta_names]
    assert len(names) == n_alg, (len(names), n_alg)
    print(f"G={G} n_alg={n_alg} nq={nq} rows={len(names)}")
    worst = np.max(np.abs(dae), axis=0)
    order = np.argsort(-worst)
    ts = tr.taus
    for j in order[:25]:
        g = int(np.argmax(np.abs(dae[:, j])))
        nm = names[j] if j < len(names) else f"row{j}"
        print(f"  {worst[j]:10.4f}  {nm:28s} worst at tau={ts[g]:.3f} "
              f"(grid {g})")


if __name__ == "__main__":
    main()
