"""Pallas TPU kernel: batched DeGrooteFregly2016 rigid-tendon muscle force.

The muscle force chain (active force-length Gaussians + force-velocity log
+ passive exponential, DeGrooteFregly2016Muscle.h:329-478) is a pure VPU
transcendental pipeline evaluated at every (solve, grid point, muscle)
triple. This kernel evaluates a (rows, muscles) tile fully in VMEM — the
seed of the Pallas compute path (the structured-KKT pipeline kernels build
on the same patterns).

On non-TPU backends the kernel runs in interpreter mode, so tests exercise
identical code paths everywhere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..models import muscle as dgf


def _force_rows(act, lMT, vMT, fmax, lopt, lts, penn, vmax, fdamp, e0_pas,
                wscale):
    """Elementwise rigid-tendon force math (mirrors
    dgf.rigid_tendon_force, vectorized over a tile)."""
    fiber_len_at = lMT - lts
    fiber_width = lopt * jnp.sin(penn)
    fiber_length = jnp.sqrt(fiber_len_at ** 2 + fiber_width ** 2)
    cos_pen = fiber_len_at / fiber_length
    norm_fiber_length = fiber_length / lopt
    fiber_velocity = vMT * cos_pen
    norm_fiber_velocity = fiber_velocity / (vmax * lopt)
    fl_act = dgf.active_force_length(norm_fiber_length, wscale)
    fv = dgf.force_velocity(norm_fiber_velocity)
    fl_pas = dgf.passive_force_length(norm_fiber_length, e0_pas)
    fiber_force = fmax * (act * fl_act * fv + fl_pas +
                          fdamp * norm_fiber_velocity)
    return fiber_force * cos_pen


def _kernel(act_ref, lmt_ref, vmt_ref, par_ref, out_ref):
    # par_ref: (8, M) stacked per-muscle parameters
    fmax = par_ref[0, :]
    lopt = par_ref[1, :]
    lts = par_ref[2, :]
    penn = par_ref[3, :]
    vmax = par_ref[4, :]
    fdamp = par_ref[5, :]
    e0 = par_ref[6, :]
    wscale = par_ref[7, :]
    out_ref[:, :] = _force_rows(act_ref[:, :], lmt_ref[:, :], vmt_ref[:, :],
                                fmax[None, :], lopt[None, :], lts[None, :],
                                penn[None, :], vmax[None, :],
                                fdamp[None, :], e0[None, :],
                                wscale[None, :])


@partial(jax.jit, static_argnames=("interpret",))
def rigid_tendon_force_pallas(act, lMT, vMT, params, interpret=None):
    """(R, M) activations/lengths/velocities + per-muscle params -> forces.

    ``params``: dict with the stacked (M,) muscle parameter arrays from
    :func:`opensim_moco_tpu.models.muscle.default_muscle_params`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R, M = act.shape
    par = jnp.stack([
        params["max_isometric_force"], params["optimal_fiber_length"],
        params["tendon_slack_length"], params["pennation_angle_at_optimal"],
        params["max_contraction_velocity"], params["fiber_damping"],
        params["passive_fiber_strain_at_one_norm_force"],
        params["active_force_width_scale"],
    ]).astype(act.dtype)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((R, M), act.dtype),
        interpret=interpret,
    )(act, lMT, vMT, par)
