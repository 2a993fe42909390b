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
import numpy as np


@dataclasses.dataclass(frozen=True)
class KKTStructure:
    """Time-grouped block structure of a transcription NLP.

    Direct collocation couples variables/constraints only between adjacent
    mesh intervals (the reference documents the same time-grouped Jacobian
    sparsity at CasOCTranscription.h:219-387), plus a thin "border"
    (times, parameters, endpoint constraints) that couples everything. With
    variables and constraints grouped per interval, the KKT matrix is
    bordered block-tridiagonal and factors in O(N nb^3) instead of
    O((N nb)^3) — the enabler for full-resolution gait meshes and for
    sharding the time axis.

    ``var_blocks``/``con_blocks``: per-interval lists of variable /
    constraint indices (original index space). ``border_vars``/
    ``border_cons``: indices coupling to every block.
    """

    var_blocks: list  # N lists of int variable indices
    con_blocks: list  # N lists of int constraint-row indices
    border_vars: np.ndarray  # (kv,) int
    border_cons: np.ndarray  # (kc,) int


@dataclasses.dataclass(frozen=True)
class NLP:
    """A differentiable NLP. ``objective``/``constraints`` must be pure and
    jit-safe; bounds use +-inf for absent bounds. ``structure`` optionally
    carries the time-grouped KKT block structure for structured solvers."""

    n: int
    m: int
    objective: Callable  # (z,) -> scalar
    constraints: Callable  # (z,) -> (m,)
    lb: jnp.ndarray  # (n,)
    ub: jnp.ndarray  # (n,)
    structure: KKTStructure | None = None

    def with_args(self, *args):
        """Bind extra closure arguments if objective/constraints take them."""
        return self
