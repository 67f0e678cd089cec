"""AIR (algebraic intermediate representation) interface.

The reference hard-wires AIRs as lists of sparse multivariate polynomials
(ref: /root/reference/src/m_polynomial.rs + stark/stark.rs:116-160).  That
works when the expanded constraint dictionary is small, but long-trace AIRs
(periodic round constants over 10^5 cycles) would explode it.  The prover and
verifier therefore accept any object with this protocol:

* ``num_constraints`` — number of transition constraints;
* ``degree_bounds(point_degrees)`` — max weighted degree per constraint,
  where ``point_degrees = [1, d, d, ..., d]`` assigns weight 1 to the cycle
  variable x and the randomized trace degree d to each register variable
  (matching stark.rs:116-160);
* ``evaluate_codewords(point)`` — evaluate all constraints pointwise given
  per-variable codewords ``point = [x, cur_0..cur_{m-1}, nxt_0..nxt_{m-1}]``
  (each [N, 8] Montgomery).  Must be jit-traceable; used by both the prover
  (on the FRI coset) and the verifier (on the queried points);
* ``fingerprint()`` — hashable identity for compiled-kernel caching.

Plain lists of MPolynomial are wrapped in :class:`ConstraintSystemAir`.
"""

from __future__ import annotations

from typing import Sequence

import jax

from ..ops.poly_ops import mpoly_evaluate_codewords
from ..poly import MPolynomial


class ConstraintSystemAir:
    """Adapter: list of sparse multivariate constraints -> AIR protocol."""

    def __init__(self, constraints: Sequence[MPolynomial]):
        assert constraints, "empty transition constraints"
        self.constraints = list(constraints)

    @property
    def num_constraints(self) -> int:
        return len(self.constraints)

    def degree_bounds(self, point_degrees: Sequence[int]) -> list[int]:
        """(ref: stark.rs:116-160)"""
        res = []
        for a in self.constraints:
            assert a.dictionary, "cannot calculate max on empty constraint"
            best = 0
            for k in a.dictionary:
                total = sum(r * l for r, l in zip(point_degrees, k))
                best = max(best, total)
            res.append(best)
        return res

    def evaluate_codewords(
        self, point: Sequence[jax.Array]
    ) -> list[jax.Array]:
        return [
            mpoly_evaluate_codewords(dict(tc.dictionary), point)
            for tc in self.constraints
        ]

    def fingerprint(self):
        return tuple(
            tuple(sorted((tuple(k), v) for k, v in tc.dictionary.items()))
            for tc in self.constraints
        )


def as_air(transition_constraints):
    """Accept either an AIR-protocol object or a list of MPolynomials."""
    if hasattr(transition_constraints, "evaluate_codewords"):
        return transition_constraints
    return ConstraintSystemAir(transition_constraints)
