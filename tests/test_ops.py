"""Pallas kernels vs reference JAX implementations."""

import jax.numpy as jnp
import numpy as np

from opensim_moco_tpu.models import muscle as dgf
from opensim_moco_tpu.ops import rigid_tendon_force_pallas


def test_muscle_kernel_matches_reference():
    rng = np.random.default_rng(0)
    M, R = 18, 16
    params = dgf.stack_muscle_params([
        dgf.default_muscle_params(
            max_isometric_force=float(rng.uniform(100, 2000)),
            optimal_fiber_length=float(rng.uniform(0.05, 0.15)),
            tendon_slack_length=float(rng.uniform(0.1, 0.3)),
            pennation_angle_at_optimal=float(rng.uniform(0, 0.3)),
            fiber_damping=0.01)
        for _ in range(M)])
    act = jnp.asarray(rng.uniform(0.01, 1.0, (R, M)))
    lopt = np.asarray(params["optimal_fiber_length"])
    lts = np.asarray(params["tendon_slack_length"])
    lMT = jnp.asarray(lts + lopt * rng.uniform(0.7, 1.3, (R, M)))
    vMT = jnp.asarray(rng.uniform(-0.3, 0.3, (R, M)))

    out = rigid_tendon_force_pallas(act, lMT, vMT, params)

    expected = np.zeros((R, M))
    for r in range(R):
        expected[r] = np.asarray(dgf.rigid_tendon_force(
            params, act[r], lMT[r], vMT[r]))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-10)
