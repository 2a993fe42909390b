"""Differentiable scalar functions used by model components.

MultivariatePolynomialFunction mirrors the reference's
Components/MultivariatePolynomialFunction.h:28-120 (used to approximate
muscle path lengths / moment arms as polynomials of coordinates). The
coefficient ordering matches the reference exactly (ascending powers
starting from the last dependent component, h:32-57), so coefficient
vectors fitted for OpenSim models drop in unchanged. Unlike the reference
(value + first derivatives only), derivatives of any order come from JAX
autodiff of the single evaluation below.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _exponent_table(dimension: int, order: int) -> np.ndarray:
    """(n_terms, dimension) exponents in the reference's coefficient order
    (MultivariatePolynomialFunction.h:62-90 nested-loop construction)."""
    if not (1 <= dimension <= 6):
        raise ValueError(f"dimension must be in [1, 6], got {dimension}")
    rows = []

    def rec(prefix, remaining):
        if len(prefix) == dimension:
            rows.append(tuple(prefix))
            return
        for k in range(remaining + 1):
            rec(prefix + [k], remaining - k)

    # the reference iterates nq[0] over [0, order] and each later dim over
    # [0, order - sum(previous)]; identical to this recursion
    rec([], order)
    return np.asarray(rows, dtype=np.int32)


class MultivariatePolynomialFunction:
    """Polynomial in up to 6 variables with reference-compatible
    coefficient ordering. Callable on an (dimension,) array; vmap/grad
    freely."""

    def __init__(self, coefficients, dimension: int, order: int):
        self.dimension = int(dimension)
        self.order = int(order)
        self._E = _exponent_table(self.dimension, self.order)
        coefficients = np.asarray(coefficients, dtype=np.float64)
        if coefficients.shape != (len(self._E),):
            raise ValueError(
                f"expected {len(self._E)} coefficients for dimension="
                f"{dimension}, order={order}; got {coefficients.shape}")
        self.coefficients = coefficients

    @property
    def n_terms(self) -> int:
        return len(self._E)

    def __call__(self, x):
        x = jnp.asarray(x)
        E = jnp.asarray(self._E, dtype=x.dtype)
        c = jnp.asarray(self.coefficients, dtype=x.dtype)
        terms = jnp.prod(jnp.where(E > 0, x[None, :] ** E, 1.0), axis=1)
        return jnp.dot(c, terms)
