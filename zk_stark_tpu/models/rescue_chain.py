"""Iterated Rescue-permutation chain: the long-trace workload.

The tutorial's only workload (one 27-round Rescue-Prime hash, trace length
28) cannot exercise production-scale evaluation domains.  This model iterates
the Rescue-XLIX round function ``chain_length * N`` times with round
constants cycling with period N, proving knowledge of an initial state that
reaches a public output — a VDF-style statement whose trace length (and
hence the FRI domain, up to 2^20+) scales freely.

The AIR has the same two degree-3 constraints as Rescue-Prime
(ref: /root/reference/src/rescue_prime/rescue_prime.rs:244-279) but the
round-constant polynomials interpolate *periodic* columns over the full
trace domain.  A generic sparse-dictionary representation would hold O(T)
terms, so this model implements the AIR protocol (models.air) directly with
closed-form evaluation:

    lhs_j = sum_k MDS[j][k] * cur_k^3 + C1_j(x)
    rhs_j = (sum_k MDS_inv[j][k] * (nxt_k - C2_k(x)))^3
    constraint_j = lhs_j - rhs_j

where C1/C2 codewords come from one structured interpolation + coset NTT
(cached per domain), and point evaluations from a batched Horner scan.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from ..field import Field
from ..ops import limbs as L
from ..ops.ntt import powers_mont
from ..ops.poly_ops import (
    evaluate_polys_shared,
    fast_coset_evaluate,
    interpolate_first_k,
)
from .rescue_prime import RescuePrime


class RescueChainAir:
    """AIR-protocol object for the iterated permutation chain."""

    def __init__(self, model: "RescueChain", omicron: int, odl: int):
        self.model = model
        self.omicron = omicron
        self.odl = odl
        self._const_cache = {}

    @property
    def num_constraints(self) -> int:
        return self.model.m

    def degree_bounds(self, point_degrees: Sequence[int]) -> list[int]:
        # dominated by the cubed state variables: 3 * trace degree (the
        # round-constant polynomials have degree <= num_rounds - 1 < trace
        # degree, and mixed terms are bounded by the same product)
        d = point_degrees[1]
        return [3 * d] * self.model.m

    def fingerprint(self):
        return (
            "rescue-chain",
            self.model.m,
            self.model.num_rounds,
            self.omicron,
            self.odl,
        )

    # -- round-constant polynomials ------------------------------------------

    def _constant_polys(self):
        """Coefficients [2, m, R?, 8] of C1_j / C2_j over the trace domain."""
        key = "coeffs"
        if key not in self._const_cache:
            with jax.ensure_compile_time_eval():
                m, rounds = self.model.m, self.model.num_rounds
                rc = self.model.rp.round_constants
                n_rc = self.model.rp.N
                c1_vals, c2_vals = [], []
                for j in range(m):
                    c1_vals.append(
                        [rc[2 * (i % n_rc) * m + j] for i in range(rounds)]
                    )
                    c2_vals.append(
                        [rc[2 * (i % n_rc) * m + m + j] for i in range(rounds)]
                    )
                coeffs = []
                for vals in c1_vals + c2_vals:
                    poly = interpolate_first_k(
                        self.omicron, self.odl, rounds, L.ints_to_mont(vals)
                    )
                    coeffs.append(poly.padded(rounds))
                self._const_cache[key] = jnp.stack(coeffs)  # [2m, R, 8]
        from ..ops.constpool import intern

        return intern(self.fingerprint() + ("coeffs",), self._const_cache[key])

    def _constant_codewords(self, domain_len: int, offset: int, root: int):
        """C1/C2 codewords on the coset (cached per domain geometry)."""
        key = ("cw", domain_len, offset, root)
        if key not in self._const_cache:
            with jax.ensure_compile_time_eval():
                coeffs = self._constant_polys()
                cws = [
                    fast_coset_evaluate(
                        _ArrPoly(coeffs[i]), offset, root, domain_len
                    )
                    for i in range(coeffs.shape[0])
                ]
                self._const_cache[key] = jnp.stack(cws)
        from ..ops.constpool import intern

        return intern(
            self.fingerprint() + ("cw", domain_len, offset, root),
            self._const_cache[key],
        )

    # -- evaluation ----------------------------------------------------------

    def _combine(self, point, c1, c2):
        """Closed-form constraint evaluation given constant columns.

        point = [x, cur..., nxt...]; c1/c2: [m, N, 8].
        """
        m = self.model.m
        cur = point[1 : 1 + m]
        nxt = point[1 + m : 1 + 2 * m]
        mds = self.model.rp.MDS
        mds_inv = self.model.rp.MDS_inv

        cubes = [
            L.mont_mul(L.mont_mul(c, c), c) for c in cur
        ]
        inner = [L.sub_mod(nxt[k], c2[k]) for k in range(m)]

        out = []
        for j in range(m):
            lhs = None
            for k in range(m):
                term = L.mont_mul(
                    jnp.broadcast_to(
                        L.int_to_mont(mds[j][k]), cubes[k].shape
                    ),
                    cubes[k],
                )
                lhs = term if lhs is None else L.add_mod(lhs, term)
            lhs = L.add_mod(lhs, c1[j])

            rhs = None
            for k in range(m):
                term = L.mont_mul(
                    jnp.broadcast_to(
                        L.int_to_mont(mds_inv[j][k]), inner[k].shape
                    ),
                    inner[k],
                )
                rhs = term if rhs is None else L.add_mod(rhs, term)
            rhs = L.mont_mul(L.mont_mul(rhs, rhs), rhs)

            out.append(L.sub_mod(lhs, rhs))
        return out

    def evaluate_codewords(self, point):
        """Constraints on codewords.

        On the full FRI coset the cached constant codewords are used; on
        arbitrary query points (the verifier) the constant polynomials are
        evaluated by one batched Horner scan.
        """
        n = point[0].shape[0]
        m = self.model.m
        stark = self.model._stark_geometry
        if stark is not None and n == stark[0]:
            cws = self._constant_codewords(*stark)
            c1 = [cws[j] for j in range(m)]
            c2 = [cws[m + j] for j in range(m)]
        else:
            coeffs = self._constant_polys()  # [2m, R, 8]
            vals = evaluate_polys_shared(coeffs, point[0])  # [2m, n, 8]
            c1 = [vals[j] for j in range(m)]
            c2 = [vals[m + j] for j in range(m)]
        return self._combine(point, c1, c2)


class _ArrPoly:
    """Minimal DPoly-alike over a raw coefficient array (no degree scans)."""

    def __init__(self, c):
        self.c = c

    def scale(self, factor_int: int):
        return _ArrPoly(
            L.mont_mul_jit(self.c, powers_mont(factor_int, self.c.shape[0]))
        )

    def padded(self, n: int):
        m = self.c.shape[0]
        if m == n:
            return self.c
        return jnp.concatenate(
            [self.c, jnp.zeros((n - m, L.NLIMB), dtype=jnp.uint32)], axis=0
        )


class RescueChain:
    """Iterated Rescue permutation over ``chain_length`` hash blocks."""

    def __init__(self, field: Field, chain_length: int, m: int = 2,
                 security_level: int = 128):
        self.field = field
        self.rp = RescuePrime(field, m, 1, security_level, 27)
        self.m = m
        self.chain_length = chain_length
        self.num_rounds = 27 * chain_length
        self.num_cycles = self.num_rounds + 1
        self._stark_geometry = None  # (fri_domain_len, offset, omega)

    # -- execution ------------------------------------------------------------

    def run(self, input_element: int) -> int:
        state = [input_element % self.field.order] + [0] * (self.m - 1)
        for i in range(self.num_rounds):
            state = self.rp._round(state, i % self.rp.N)
        return state[0]

    def trace(self, input_element: int) -> list[list[int]]:
        state = [input_element % self.field.order] + [0] * (self.m - 1)
        out = [list(state)]
        for i in range(self.num_rounds):
            state = self.rp._round(state, i % self.rp.N)
            out.append(list(state))
        return out

    # -- AIR -----------------------------------------------------------------

    def air(self, omicron: int, omicron_domain_length: int) -> RescueChainAir:
        return RescueChainAir(self, omicron, omicron_domain_length)

    def bind_stark(self, stark) -> None:
        """Tell the AIR the prover's coset geometry (enables the cached
        constant-codeword fast path inside the fused prover segment)."""
        self._stark_geometry = (
            stark.fri.domain_length,
            stark.generator,
            stark.omega,
        )

    def boundary_constraints(self, output_element: int):
        return [
            (0, 1, 0),
            (self.num_rounds, 0, output_element % self.field.order),
        ]


def make_chain_stark(
    field: Field,
    chain_length: int,
    expansion_factor: int = 4,
    num_collinearity_checks: int = 64,
    security_level: int = 128,
):
    """Build a RescueChain model with a matching Stark instance.

    chain_length ~3200 gives an omicron domain of 2^18 and a 2^20-point FRI
    domain (BASELINE config 5 scale on a single address space).
    """
    from ..stark import Stark

    model = RescueChain(field, chain_length, 2, security_level)
    stark = Stark(
        field,
        expansion_factor,
        num_collinearity_checks,
        security_level,
        model.m,
        model.num_cycles,
        3,
    )
    model.bind_stark(stark)
    return model, stark
