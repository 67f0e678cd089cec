"""Rescue-Prime hash, execution trace and AIR arithmetization.

The only "model" of the framework — the workload the STARK proves
(ref: /root/reference/src/rescue_prime/rescue_prime.rs:11-287).  Setup (alpha,
MDS, round constants) and single-input hashing/tracing run on the host with
Python ints; bulk hashing (Merkle-leaf batches) runs on device through
``hash_batch`` (ops.rescue_ops).
"""

from __future__ import annotations

from typing import Sequence

import jax

from ..field import Field
from ..ops import limbs as L
from ..ops import rescue_ops
from ..poly import MPolynomial, Polynomial
from ..utils.bits import bit_count
from ..utils.hashing import shake256
from ..utils.matrix_f import inverse, rref, transpose


class RescuePrime:
    """(ref: rescue_prime.rs:106-127)"""

    def __init__(
        self,
        field: Field,
        m: int = 2,
        capacity: int = 1,
        security_level: int = 128,
        N: int = 27,
    ):
        self.field = field
        self.m = m
        self.capacity = capacity
        self.N = N

        g = field.smallest_generator()
        self.alpha = g.value
        # quirk kept from the reference (rescue_prime.rs:123): alpha_inv is
        # computed as inv(p - alpha) mod p.  For this prime it coincides with
        # the inverse of alpha modulo p-1 (verified by the hash test vector),
        # which is what x -> x^alpha_inv being the S-box inverse requires.
        self.alpha_inv = field.inv((-g.value) % field.order)
        self.MDS = self._get_mds(g.value, m)
        self.MDS_inv = inverse(field, self.MDS)
        self.round_constants = self._get_round_constants(
            field, m, capacity, security_level, N
        )
        self._device_cache = None
        self._air_cache: dict = {}

    # -- setup ---------------------------------------------------------------

    def _get_mds(self, g: int, m: int) -> list[list[int]]:
        """Systematic Vandermonde MDS (ref: rescue_prime.rs:130-150)."""
        p = self.field.order
        matrix = [
            [pow(g, i * j, p) for j in range(2 * m)] for i in range(m)
        ]
        rref(self.field, matrix)
        matrix = [row[m:] for row in matrix]
        return transpose(matrix)

    @staticmethod
    def _get_round_constants(
        field: Field, m: int, capacity: int, security_level: int, N: int
    ) -> list[int]:
        """SHAKE-256 expanded, base-256 little-endian folded
        (ref: rescue_prime.rs:152-182)."""
        p = field.order
        bytes_per_int = (bit_count(p) + 7) // 8 + 1
        num_bytes = bytes_per_int * 2 * m * N
        seed = f"Rescue-XLIX({p},{m},{capacity},{security_level})"
        data = shake256(seed.encode(), num_bytes)
        constants = []
        for i in range(2 * m * N):
            chunk = data[bytes_per_int * i : bytes_per_int * (i + 1)]
            acc = 0
            for j, b in enumerate(chunk):
                acc = (acc + pow(256, j, p) * b) % p
            constants.append(acc)
        return constants

    # -- host permutation (ref: rescue_prime.rs:50-104) ----------------------

    def _round(self, state: list[int], r: int) -> list[int]:
        p = self.field.order
        m = self.m
        # forward S-box
        state = [pow(s, self.alpha, p) for s in state]
        # MDS
        state = [
            sum(self.MDS[j][i] * state[i] for i in range(m)) % p
            for j in range(m)
        ]
        # first constants
        state = [
            (s + self.round_constants[2 * r * m + i]) % p
            for i, s in enumerate(state)
        ]
        # inverse S-box
        state = [pow(s, self.alpha_inv, p) for s in state]
        # MDS
        state = [
            sum(self.MDS[j][i] * state[i] for i in range(m)) % p
            for j in range(m)
        ]
        # second constants
        state = [
            (s + self.round_constants[2 * r * m + m + i]) % p
            for i, s in enumerate(state)
        ]
        return state

    def hash(self, input_element: int) -> int:
        """Sponge with rate=capacity elements absorbed once
        (ref: rescue_prime.rs:185-192)."""
        state = [input_element % self.field.order] + [0] * (
            self.m - self.capacity
        )
        for r in range(self.N):
            state = self._round(state, r)
        return state[0]

    def trace(self, input_element: int) -> list[list[int]]:
        """N+1 states of the permutation (ref: rescue_prime.rs:194-204)."""
        state = [input_element % self.field.order] + [0] * (
            self.m - self.capacity
        )
        out = [list(state)]
        for r in range(self.N):
            state = self._round(state, r)
            out.append(list(state))
        return out

    # -- device batched hashing ----------------------------------------------

    def _device_constants(self):
        if self._device_cache is None:
            mds = L.ints_to_mont(
                [v for row in self.MDS for v in row]
            ).reshape(self.m, self.m, L.NLIMB)
            rc = L.ints_to_mont(self.round_constants)
            self._device_cache = (mds, rc)
        return self._device_cache

    def hash_batch(self, inputs: Sequence[int]) -> list[int]:
        """Batched device hashing of many inputs (Merkle-leaf path)."""
        return [int(v) for v in L.mont_to_ints(
            self.hash_batch_device(L.ints_to_mont(list(inputs)))
        )]

    def hash_batch_device(self, inputs_mont: jax.Array) -> jax.Array:
        """[B, 8] Montgomery inputs -> [B, 8] Montgomery digests."""
        import jax.numpy as jnp

        b = inputs_mont.shape[0]
        state = jnp.concatenate(
            [
                inputs_mont[:, None, :],
                jnp.zeros(
                    (b, self.m - self.capacity, L.NLIMB), dtype=jnp.uint32
                ),
            ],
            axis=1,
        )
        mds, rc = self._device_constants()
        out = rescue_ops.permutation_batch(
            state, mds, rc, self.N, self.alpha, self.alpha_inv
        )
        return out[:, 0, :]

    # -- AIR (ref: rescue_prime.rs:206-287) ----------------------------------

    def round_constants_polynomials(
        self, omicron: int, omicron_domain_length: int
    ) -> tuple[list[MPolynomial], list[MPolynomial]]:
        p = self.field.order
        domain = [pow(omicron, r, p) for r in range(self.N)]
        first, second = [], []
        for i in range(self.m):
            values = [
                self.round_constants[2 * r * self.m + i] for r in range(self.N)
            ]
            poly = Polynomial.interpolate_domain(self.field, domain, values)
            first.append(MPolynomial.lift(poly, 0))
        for i in range(self.m):
            values = [
                self.round_constants[2 * r * self.m + self.m + i]
                for r in range(self.N)
            ]
            poly = Polynomial.interpolate_domain(self.field, domain, values)
            second.append(MPolynomial.lift(poly, 0))
        return first, second

    def transition_constraints(
        self, omicron: int, omicron_domain_length: int
    ) -> list[MPolynomial]:
        """m constraints of the form
        ``MDS * prev^alpha + c_first - (MDS_inv * (next - c_second))^alpha``
        (ref: rescue_prime.rs:244-279).

        Cached per (omicron, domain length): the host-side symbolic build
        (interpolating 2m round-constant polynomials and composing degree-3
        multivariate terms) costs ~75 ms and is identical for every
        prove/verify at a given configuration.
        """
        key = (omicron, omicron_domain_length)
        cached = self._air_cache.get(key)
        if cached is not None:
            return list(cached)
        first_step, second_step = self.round_constants_polynomials(
            omicron, omicron_domain_length
        )
        variables = MPolynomial.variables(1 + 2 * self.m, self.field)
        previous_state = variables[1 : 1 + self.m]
        next_state = variables[1 + self.m : 1 + 2 * self.m]

        constraints = []
        for i in range(self.m):
            lhs = MPolynomial.zero(self.field)
            for k in range(self.m):
                lhs = lhs + MPolynomial.constant(
                    self.field, self.MDS[i][k]
                ) * (previous_state[k] ** self.alpha)
            lhs = lhs + first_step[i]

            rhs = MPolynomial.zero(self.field)
            for k in range(self.m):
                rhs = rhs + MPolynomial.constant(
                    self.field, self.MDS_inv[i][k]
                ) * (next_state[k] - second_step[k])
            rhs = rhs ** self.alpha

            constraints.append(lhs - rhs)
        # store an immutable tuple and hand out fresh lists so caller-side
        # mutation cannot poison the cached AIR
        self._air_cache[key] = tuple(constraints)
        return constraints

    def boundary_constraints(
        self, output_element: int
    ) -> list[tuple[int, int, int]]:
        """(ref: rescue_prime.rs:281-287)"""
        return [
            (0, 1, 0),
            (self.N, 0, output_element % self.field.order),
        ]
