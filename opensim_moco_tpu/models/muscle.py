"""DeGrooteFregly2016 muscle model in pure JAX.

Re-derivation of the reference's smooth Hill-type muscle
(reference Moco/Moco/Components/DeGrooteFregly2016Muscle.{h,cpp}) as pure,
vectorized functions. Exact curve constants are taken from
DeGrooteFregly2016Muscle.h:764-817; activation dynamics from
DeGrooteFregly2016Muscle.cpp:186-210; fiber/tendon kinematics from
DeGrooteFregly2016Muscle.cpp:240-325.

All functions are elementwise: pass per-muscle parameter arrays of shape
``(n_muscles,)`` and state arrays of the same shape to evaluate every muscle
of a model in one fused VPU pass (the reference evaluates muscles one at a
time inside Simbody's realizeDynamics).

Unlike the reference there is no Newton "estimateMuscleFiberState" loop in
the hot path: with a rigid tendon the force is closed-form, and with a
compliant tendon the state is the normalized tendon force itself (explicit
or implicit dynamics), exactly as in the reference's direct-collocation
formulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Active force-length curve constants (DeGrooteFregly2016Muscle.h:769-780).
B11 = 0.8150671134243542
B21 = 1.055033428970575
B31 = 0.162384573599574
B41 = 0.063303448465465
B12 = 0.433004984392647
B22 = 0.716775413397760
B32 = -0.029947116970696
B42 = 0.200356847296188
B13 = 0.1
B23 = 1.0
B33 = 0.353553390593274  # 0.5 * sqrt(0.5)
B43 = 0.0

# Passive force-length exponential shape factor (h:785).
KPE = 4.0

# Tendon force-length constants (h:789-798).
C1 = 0.200
C2 = 1.0
C3 = 0.200

# Force-velocity constants (h:808-811).
D1 = -0.3211346127989808
D2 = -8.149
D3 = -0.374
D4 = 0.8825327733249912

MIN_NORM_FIBER_LENGTH = 0.2
MAX_NORM_FIBER_LENGTH = 1.8
MIN_NORM_TENDON_FORCE = 0.0
MAX_NORM_TENDON_FORCE = 5.0

TANH_STEEPNESS = 0.1  # activation-dynamics switching (cpp:195)


def default_muscle_params(max_isometric_force=1000.0,
                          optimal_fiber_length=0.1,
                          tendon_slack_length=0.2,
                          pennation_angle_at_optimal=0.0,
                          max_contraction_velocity=10.0,
                          activation_time_constant=0.015,
                          deactivation_time_constant=0.060,
                          active_force_width_scale=1.0,
                          fiber_damping=0.0,
                          passive_fiber_strain_at_one_norm_force=0.6,
                          tendon_strain_at_one_norm_force=0.049):
    """Parameter pytree for one muscle (broadcast/stack for many).

    Defaults mirror DeGrooteFregly2016Muscle::constructProperties
    (DeGrooteFregly2016Muscle.cpp:53-62) and the Muscle base-class defaults.
    """
    return {
        "max_isometric_force": jnp.asarray(max_isometric_force, float),
        "optimal_fiber_length": jnp.asarray(optimal_fiber_length, float),
        "tendon_slack_length": jnp.asarray(tendon_slack_length, float),
        "pennation_angle_at_optimal":
            jnp.asarray(pennation_angle_at_optimal, float),
        "max_contraction_velocity":
            jnp.asarray(max_contraction_velocity, float),
        "activation_time_constant":
            jnp.asarray(activation_time_constant, float),
        "deactivation_time_constant":
            jnp.asarray(deactivation_time_constant, float),
        "active_force_width_scale":
            jnp.asarray(active_force_width_scale, float),
        "fiber_damping": jnp.asarray(fiber_damping, float),
        "passive_fiber_strain_at_one_norm_force":
            jnp.asarray(passive_fiber_strain_at_one_norm_force, float),
        "tendon_strain_at_one_norm_force":
            jnp.asarray(tendon_strain_at_one_norm_force, float),
    }


def stack_muscle_params(params_list):
    """Stack per-muscle parameter pytrees into arrays of shape (n,)."""
    keys = params_list[0].keys()
    return {k: jnp.stack([p[k] for p in params_list]) for k in keys}


# ----------------------------------------------------------------- curves

def _gaussian_like(x, b1, b2, b3, b4):
    # DeGrooteFregly2016Muscle.h:720-725 (note squared denominator).
    return b1 * jnp.exp(-0.5 * (x - b2) ** 2 / (b3 + b4 * x) ** 2)


def active_force_length(norm_fiber_length, width_scale=1.0):
    """Sum of 3 Gaussian-like curves; f(1) = 1 (h:329-341)."""
    x = (norm_fiber_length - 1.0) / width_scale + 1.0
    return (_gaussian_like(x, B11, B21, B31, B41) +
            _gaussian_like(x, B12, B22, B32, B42) +
            _gaussian_like(x, B13, B23, B33, B43))


def force_velocity(norm_fiber_velocity):
    """fv multiplier; fv(-1)=0, fv(0)=1, range [0, 1.794] (h:360-370)."""
    tempV = D2 * norm_fiber_velocity + D3
    tempLogArg = tempV + jnp.sqrt(tempV ** 2 + 1.0)
    return D1 * jnp.log(tempLogArg) + D4


def force_velocity_inverse(fv_multiplier):
    """Inverse of force_velocity (h:372-381)."""
    return (jnp.sinh(1.0 / D1 * (fv_multiplier - D4)) - D3) / D2


def passive_force_length(norm_fiber_length, e0=0.6, ignore=False):
    """Passive fiber force; zero at norm length 0.2 (h:383-405).
    ``ignore`` may be a bool or a per-muscle bool/float array
    (ModOpIgnorePassiveFiberForcesDGF support)."""
    offset = jnp.exp(KPE * (MIN_NORM_FIBER_LENGTH - 1.0) / e0)
    denom = jnp.exp(KPE) - offset
    val = (jnp.exp(KPE * (norm_fiber_length - 1.0) / e0) - offset) / denom
    if ignore is False:
        return val
    return jnp.where(jnp.asarray(ignore), 0.0, val)


def tendon_kT(tendon_strain_at_one_norm_force):
    """Tendon exponential stiffness from strain-at-one-norm-force
    (DeGrooteFregly2016Muscle.cpp:140-141)."""
    return jnp.log((1.0 + C3) / C1) / tendon_strain_at_one_norm_force


def tendon_force_multiplier(norm_tendon_length, kT):
    """Normalized tendon force vs normalized tendon length (h:437-443)."""
    return C1 * jnp.exp(kT * (norm_tendon_length - C2)) - C3


def tendon_force_multiplier_derivative(norm_tendon_length, kT):
    return C1 * kT * jnp.exp(kT * (norm_tendon_length - C2))


def tendon_force_length_inverse(norm_tendon_force, kT):
    """Normalized tendon length vs normalized tendon force (h:461-465)."""
    return jnp.log((1.0 / C1) * (norm_tendon_force + C3)) / kT + C2


def tendon_force_length_inverse_derivative(d_norm_tendon_force,
                                           norm_tendon_length, kT):
    """Normalized tendon velocity from d(normTendonForce)/dt (h:468-475)."""
    return d_norm_tendon_force / (C1 * kT *
                                  jnp.exp(kT * (norm_tendon_length - C2)))


# ------------------------------------------------------------- dynamics

def activation_dynamics(excitation, activation, tau_act=0.015,
                        tau_deact=0.060):
    """da/dt with tanh-switched time constants (cpp:186-210).

    f = 0.5 tanh(b (e - a)); z = 0.5 + 1.5 a
    da/dt = [(f + 0.5)/(tau_a z) + (-f + 0.5) z / tau_d] (e - a)
    """
    z = 0.5 + 1.5 * activation
    temp_act = 1.0 / (tau_act * z)
    temp_deact = z / tau_deact
    f = 0.5 * jnp.tanh(TANH_STEEPNESS * (excitation - activation))
    time_const = temp_act * (f + 0.5) + temp_deact * (-f + 0.5)
    return time_const * (excitation - activation)


def _fiber_geometry(p, fiber_length_along_tendon):
    """normFiberLength, cos/sin pennation from fiber length along tendon
    (cpp:255-268). Uses the fixed-width pennation model."""
    lMopt = p["optimal_fiber_length"]
    fiber_width = lMopt * jnp.sin(p["pennation_angle_at_optimal"])
    fiber_length = jnp.sqrt(fiber_length_along_tendon ** 2 + fiber_width ** 2)
    cos_pen = fiber_length_along_tendon / fiber_length
    sin_pen = fiber_width / fiber_length
    return fiber_length, fiber_length / lMopt, cos_pen, sin_pen


def rigid_tendon_force(p, activation, lMT, vMT, ignore_passive_fiber_force=False):
    """Tendon (= path) force with a rigid tendon: closed form, no state.

    Mirrors the ignoreTendonCompliance branches of the MuscleLengthInfo /
    FiberVelocityInfo / MuscleDynamicsInfo helpers (cpp:240-380).
    Returns the force applied along the muscle path (N).
    """
    lT = p["tendon_slack_length"]  # normTendonLength = 1
    fiber_len_at = lMT - lT
    fiber_length, norm_fiber_length, cos_pen, sin_pen = _fiber_geometry(
        p, fiber_len_at)
    # rigid tendon: tendon velocity zero, all path velocity goes to fiber
    fiber_vel_at = vMT
    fiber_velocity = fiber_vel_at * cos_pen
    norm_fiber_velocity = fiber_velocity / (
        p["max_contraction_velocity"] * p["optimal_fiber_length"])
    fl_act = active_force_length(norm_fiber_length,
                                 p["active_force_width_scale"])
    fv = force_velocity(norm_fiber_velocity)
    fl_pas = passive_force_length(
        norm_fiber_length, p["passive_fiber_strain_at_one_norm_force"],
        ignore=ignore_passive_fiber_force)
    fmax = p["max_isometric_force"]
    fiber_force = fmax * (activation * fl_act * fv + fl_pas +
                          p["fiber_damping"] * norm_fiber_velocity)
    return fiber_force * cos_pen


def compliant_tendon_state(p, norm_tendon_force, lMT,
                           ignore_passive_fiber_force=False):
    """Geometry shared by explicit/implicit compliant-tendon paths.

    Returns (norm_tendon_length, fiber_length, norm_fiber_length,
    cos_pen, sin_pen)."""
    kT = tendon_kT(p["tendon_strain_at_one_norm_force"])
    norm_tendon_length = tendon_force_length_inverse(norm_tendon_force, kT)
    tendon_length = p["tendon_slack_length"] * norm_tendon_length
    fiber_len_at = lMT - tendon_length
    fiber_length, norm_fiber_length, cos_pen, sin_pen = _fiber_geometry(
        p, fiber_len_at)
    return norm_tendon_length, fiber_length, norm_fiber_length, cos_pen, sin_pen


def explicit_tendon_dynamics(p, activation, norm_tendon_force, lMT, vMT,
                             ignore_passive_fiber_force=False):
    """d(normTendonForce)/dt for explicit tendon-compliance dynamics.

    Follows the isTendonDynamicsExplicit branch of
    calcFiberVelocityInfoHelper (cpp:285-300): invert the force-velocity
    curve to get fiber velocity from the force state, then chain rule
    through the tendon force-length curve.
    """
    kT = tendon_kT(p["tendon_strain_at_one_norm_force"])
    (norm_tendon_length, fiber_length, norm_fiber_length, cos_pen,
     sin_pen) = compliant_tendon_state(p, norm_tendon_force, lMT)
    fl_act = active_force_length(norm_fiber_length,
                                 p["active_force_width_scale"])
    fl_pas = passive_force_length(
        norm_fiber_length, p["passive_fiber_strain_at_one_norm_force"],
        ignore=ignore_passive_fiber_force)
    norm_fiber_force = norm_tendon_force / cos_pen
    fv = (norm_fiber_force - fl_pas) / (activation * fl_act)
    norm_fiber_velocity = force_velocity_inverse(fv)
    fiber_velocity = norm_fiber_velocity * (
        p["max_contraction_velocity"] * p["optimal_fiber_length"])
    fiber_vel_at = fiber_velocity / cos_pen
    tendon_velocity = vMT - fiber_vel_at
    norm_tendon_velocity = tendon_velocity / p["tendon_slack_length"]
    return norm_tendon_velocity * tendon_force_multiplier_derivative(
        norm_tendon_length, kT)


def implicit_tendon_residual(p, activation, norm_tendon_force,
                             d_norm_tendon_force, lMT, vMT,
                             ignore_passive_fiber_force=False):
    """Equilibrium residual (N) for implicit tendon-compliance dynamics.

    residual = tendonForce - fiberForceAlongTendon
    (calcEquilibriumResidual, h:641-646; exposed as
    implicitresidual_normalized_tendon_force, cpp:826-848). The fiber
    velocity comes from the supplied normalized-tendon-force derivative via
    the inverse tendon force-length curve (cpp:301-315).
    """
    kT = tendon_kT(p["tendon_strain_at_one_norm_force"])
    (norm_tendon_length, fiber_length, norm_fiber_length, cos_pen,
     sin_pen) = compliant_tendon_state(p, norm_tendon_force, lMT)
    norm_tendon_velocity = tendon_force_length_inverse_derivative(
        d_norm_tendon_force, norm_tendon_length, kT)
    tendon_velocity = p["tendon_slack_length"] * norm_tendon_velocity
    fiber_vel_at = vMT - tendon_velocity
    fiber_velocity = fiber_vel_at * cos_pen
    norm_fiber_velocity = fiber_velocity / (
        p["max_contraction_velocity"] * p["optimal_fiber_length"])
    fl_act = active_force_length(norm_fiber_length,
                                 p["active_force_width_scale"])
    fv = force_velocity(norm_fiber_velocity)
    fl_pas = passive_force_length(
        norm_fiber_length, p["passive_fiber_strain_at_one_norm_force"],
        ignore=ignore_passive_fiber_force)
    fmax = p["max_isometric_force"]
    fiber_force = fmax * (activation * fl_act * fv + fl_pas +
                          p["fiber_damping"] * norm_fiber_velocity)
    fiber_force_at = fiber_force * cos_pen
    tendon_force = fmax * norm_tendon_force
    return tendon_force - fiber_force_at


def tendon_force_from_state(p, norm_tendon_force):
    """Path force (N) applied by a compliant-tendon muscle."""
    return p["max_isometric_force"] * norm_tendon_force


def linearized_equilibrium_residual_derivative(
        p, activation, norm_tendon_force, d_norm_tendon_force, lMT, vMT,
        ignore_passive_fiber_force=False):
    """Time derivative of the linearized muscle-tendon equilibrium
    (Millard et al. 2013 eq. A6; reference
    DeGrooteFregly2016Muscle.h:644-654):

        residual = k_fiber_AT * v_fiber_AT - k_tendon * (vMT - v_fiber_AT)

    with fiber velocity along the tendon derived from the supplied
    normalized-tendon-force derivative (implicit tendon dynamics), the
    tendon stiffness from the exponential tendon curve, and the fiber
    stiffness along the tendon by autodiff of fiberForceAlongTendon w.r.t.
    fiber length along the tendon (force-velocity multiplier held fixed,
    as in the reference's MuscleDynamicsInfo stiffness). Elementwise over
    muscles. Backs MocoInitialVelocityEquilibriumDGFGoal.
    """
    kT = tendon_kT(p["tendon_strain_at_one_norm_force"])
    (norm_tendon_length, fiber_length, norm_fiber_length, cos_pen,
     sin_pen) = compliant_tendon_state(p, norm_tendon_force, lMT)
    norm_tendon_velocity = tendon_force_length_inverse_derivative(
        d_norm_tendon_force, norm_tendon_length, kT)
    tendon_velocity = p["tendon_slack_length"] * norm_tendon_velocity
    fiber_vel_at = vMT - tendon_velocity
    fiber_velocity = fiber_vel_at * cos_pen
    norm_fiber_velocity = fiber_velocity / (
        p["max_contraction_velocity"] * p["optimal_fiber_length"])
    fv = force_velocity(norm_fiber_velocity)
    fmax = p["max_isometric_force"]

    def fiber_force_at(fiber_len_at):
        fl, nfl, cp_, sp_ = _fiber_geometry(p, fiber_len_at)
        fl_act = active_force_length(nfl, p["active_force_width_scale"])
        fl_pas = passive_force_length(
            nfl, p["passive_fiber_strain_at_one_norm_force"],
            ignore=ignore_passive_fiber_force)
        ff = fmax * (activation * fl_act * fv + fl_pas +
                     p["fiber_damping"] * norm_fiber_velocity)
        return jnp.sum(ff * cp_)

    tendon_length = p["tendon_slack_length"] * norm_tendon_length
    fiber_len_at = lMT - tendon_length
    k_fiber_at = jax.grad(fiber_force_at)(fiber_len_at)
    # tendon stiffness dF_T/dl_T (N/m)
    k_tendon = fmax * tendon_force_multiplier_derivative(
        norm_tendon_length, kT) / p["tendon_slack_length"]
    return k_fiber_at * fiber_vel_at - k_tendon * (vMT - fiber_vel_at)
