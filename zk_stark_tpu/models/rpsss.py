"""RPSSS — Rescue-Prime STARK Signature Scheme.

sign = STARK-prove knowledge of a Rescue-Prime preimage of the public key,
bound to the document via a Fiat-Shamir prefix
(ref: /root/reference/src/rpsss.rs:10-80).
"""

from __future__ import annotations

import os
from typing import Callable

from ..field import Field
from ..proof_stream import SignatureProofStream, deserialize_items
from ..stark import ProvingError, Stark, VerificationError
from .rescue_prime import RescuePrime


class RPSSS:
    """(ref: rpsss.rs:15-36)"""

    def __init__(
        self,
        field: Field,
        expansion_factor: int = 4,
        num_collinearity_checks: int = 64,
        security_level: int = 128,
        transition_constraints_degree: int = 3,
        rng: Callable[[int], bytes] = os.urandom,
    ):
        self.field = field
        self.rp = RescuePrime(field, 2, 1, security_level, 27)
        self.stark = Stark(
            field,
            expansion_factor,
            num_collinearity_checks,
            security_level,
            self.rp.m,
            self.rp.N + 1,
            transition_constraints_degree,
            rng=rng,
        )
        self._rng = rng

    def keygen(self) -> tuple[int, int]:
        """sk = sample(17 random bytes); pk = hash(sk) (ref: rpsss.rs:61-68)."""
        sk = self.field.sample(self._rng(17)).value
        pk = self.rp.hash(sk)
        return sk, pk

    def sign(self, sk: int, document: bytes) -> bytes:
        """(ref: rpsss.rs:70-73 + 38-49)"""
        sps = SignatureProofStream(self.field, document)
        output_element = self.rp.hash(sk)
        trace = self.rp.trace(sk)
        transition_constraints = self.rp.transition_constraints(
            self.stark.omicron, self.stark.omicron_domain_length
        )
        boundary = self.rp.boundary_constraints(output_element)
        return self.stark.prove(
            trace, transition_constraints, boundary, sps
        )

    def verify(self, pk: int, document: bytes, signature: bytes) -> bool:
        """(ref: rpsss.rs:75-79 + 51-59).  Returns True iff valid."""
        sps = SignatureProofStream(self.field, document)
        try:
            sps.items = deserialize_items(signature, self.field)
        except (ValueError, AssertionError):
            return False
        boundary = self.rp.boundary_constraints(pk)
        transition_constraints = self.rp.transition_constraints(
            self.stark.omicron, self.stark.omicron_domain_length
        )
        try:
            self.stark.verify(transition_constraints, boundary, sps)
        except (VerificationError, ProvingError, ValueError, AssertionError):
            return False
        return True
