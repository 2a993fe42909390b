"""Bhargava et al. 2004 muscle metabolic energy model in pure JAX.

Re-derivation of reference Moco/Moco/Components/Bhargava2004Metabolics.cpp
(constants :56-174, heat rates :350-465, clamping :480-530). All rates are
elementwise over muscles, so a model's full metabolic cost is one fused
VPU pass; smoothing variants use tanh as in the reference.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# defaults (Bhargava2004Metabolics.cpp:56-69,164-174)
SPECIFIC_TENSION = 0.25e6  # Pa
DENSITY = 1059.7  # kg/m^3
ACT_CONST_SLOW = 40.0
ACT_CONST_FAST = 133.0
MAINT_CONST_SLOW = 74.0
MAINT_CONST_FAST = 111.0
BASAL_COEFFICIENT = 1.2
BASAL_EXPONENT = 1.0

# fiber-length dependence of maintenance heat: piecewise linear through
# (0, .5), (.5, .5), (1, 1), (1.5, 0), (10, 0)  (cpp:78-82)
_FL_X = np.array([0.0, 0.5, 1.0, 1.5, 10.0])
_FL_Y = np.array([0.5, 0.5, 1.0, 0.0, 0.0])


def muscle_mass(max_isometric_force, optimal_fiber_length,
                specific_tension=SPECIFIC_TENSION, density=DENSITY):
    """Default mass approximation (Bhargava2004Metabolics.cpp:96-104):
    m = (Fmax / sigma) * rho * lMopt."""
    return (max_isometric_force / specific_tension) * density * \
        optimal_fiber_length


def _fiber_length_dependence(norm_fiber_length):
    return jnp.interp(norm_fiber_length, jnp.asarray(_FL_X),
                      jnp.asarray(_FL_Y))


def _conditional(cond, left, right, smoothing, smooth):
    """Reference m_conditional semantics
    (Bhargava2004Metabolics.cpp:179-213): ``left`` when cond <= 0,
    ``right`` when cond > 0; tanh-blended when smoothing is on."""
    if smooth:
        sb = 0.5 + 0.5 * jnp.tanh(smoothing * cond)
        return left + (right - left) * sb
    return jnp.where(cond <= 0, left, right)


def metabolic_rates(activation, excitation, norm_fiber_length,
                    fiber_velocity, active_fiber_force, passive_fiber_force,
                    active_force_length_multiplier, max_isometric_force,
                    mass,
                    ratio_slow_twitch=0.5,
                    use_force_dependent_shortening=False,
                    include_negative_mechanical_work=True,
                    forbid_negative_total_power=True,
                    enforce_minimum_heat_rate=True,
                    use_smoothing=False, velocity_smoothing=10.0,
                    power_smoothing=10.0, heat_rate_smoothing=10.0,
                    effort_scaling=1.0):
    """Per-muscle metabolic rates (W). Returns dict of
    {total, activation, maintenance, shortening, mechanical_work}.

    Sign convention: fiber_velocity < 0 is shortening (cpp:417-419).
    """
    eps = 1e-16
    a = effort_scaling * activation
    e = effort_scaling * excitation
    f_act = effort_scaling * active_fiber_force
    f_tot = f_act + passive_fiber_force
    slow = ratio_slow_twitch * jnp.sin(jnp.pi / 2 * e)
    fast = (1.0 - ratio_slow_twitch) * (1.0 - jnp.cos(jnp.pi / 2 * e))

    iso_active = a * active_force_length_multiplier * max_isometric_force

    act_rate = mass * (ACT_CONST_SLOW * slow + ACT_CONST_FAST * fast)
    maint_rate = mass * _fiber_length_dependence(norm_fiber_length) * \
        (MAINT_CONST_SLOW * slow + MAINT_CONST_FAST * fast)

    v = fiber_velocity + eps
    if use_force_dependent_shortening:
        alpha = _conditional(v, 0.16 * iso_active + 0.18 * f_tot,
                             0.157 * f_tot, velocity_smoothing,
                             use_smoothing)
    else:
        alpha = _conditional(v, 0.25 * f_tot, 0.0, velocity_smoothing,
                             use_smoothing)
    short_rate = -alpha * v

    if include_negative_mechanical_work:
        work_rate = -f_act * fiber_velocity
    else:
        work_rate = _conditional(v, -f_act * fiber_velocity, 0.0,
                                 velocity_smoothing, use_smoothing)

    if forbid_negative_total_power:
        before = act_rate + maint_rate + short_rate + work_rate
        # cond = -before: positive (i.e. before < 0) selects `before`,
        # which is then subtracted from the shortening heat (cpp:480-496)
        clamped = _conditional(-before, 0.0, before, power_smoothing,
                               use_smoothing)
        short_rate = short_rate - clamped

    total_heat = act_rate + maint_rate + short_rate
    if enforce_minimum_heat_rate:
        # total heat rate >= 1.0 W/kg (Umberger 2003, cpp:498-523)
        total_heat = _conditional(-total_heat + mass, total_heat, mass,
                                  heat_rate_smoothing, use_smoothing)

    total = total_heat + work_rate
    return {
        "total": total,
        "activation": act_rate,
        "maintenance": maint_rate,
        "shortening": short_rate,
        "mechanical_work": work_rate,
    }


def basal_rate(body_mass, coefficient=BASAL_COEFFICIENT,
               exponent=BASAL_EXPONENT):
    """Whole-body basal rate Bdot = coeff * mass^exp (cpp:221-223)."""
    return coefficient * body_mass ** exponent
