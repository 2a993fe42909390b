"""NLP problem statement in IPOPT standard form.

    minimize    f(z)
    subject to  c(z) = 0
                l <= z <= u

General inequality path constraints are converted to equalities plus bounded
slack variables by the transcription layer, so the solver only ever sees this
form (same normalization IPOPT itself performs; cf. reference tropter
optimization/Problem.h:27-100 which keeps two-sided constraint bounds and
lets IPOPT do it).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class NLP:
    """A differentiable NLP. ``objective``/``constraints`` must be pure and
    jit-safe; bounds use +-inf for absent bounds."""

    n: int
    m: int
    objective: Callable  # (z,) -> scalar
    constraints: Callable  # (z,) -> (m,)
    lb: jnp.ndarray  # (n,)
    ub: jnp.ndarray  # (n,)

    def with_args(self, *args):
        """Bind extra closure arguments if objective/constraints take them."""
        return self
