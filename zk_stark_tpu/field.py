"""Host-side prime field GF(p), p = 1 + 407*2^119.

TPU-native redesign of the reference field layer
(ref: /root/reference/src/field/field.rs:10-169 and
 /root/reference/src/field/field_element.rs:7-143).

Design: scalar field math (transcript challenges, verifier checks, setup
constants) lives on the host as Python ints — arbitrary-precision and exact.
Bulk field math (codewords, NTT butterflies, batched hashing inputs) lives on
device as 8x16-bit limb vectors in Montgomery form (see zk_stark_tpu.ops.limbs).
The two representations agree on canonical integer values at every boundary.
"""

from __future__ import annotations

from dataclasses import dataclass
from math import gcd

#: The STARK-friendly prime of the reference: 1 + 407 * 2^119
#: (ref: field/field.rs:10).
FIELD_PRIME = 1 + 407 * (1 << 119)

#: Fixed generator used as coset offset (ref: field/field.rs:43).
_GENERATOR_VALUE = 85408008396924667383611388730472331217


class Field:
    """Field context; ``order`` is usually :data:`FIELD_PRIME`.

    (ref: field/field.rs:12-38)
    """

    __slots__ = ("order",)

    def __init__(self, order: int = FIELD_PRIME):
        self.order = order

    def __eq__(self, other) -> bool:
        return isinstance(other, Field) and self.order == other.order

    def __hash__(self) -> int:
        return hash(("Field", self.order))

    def __repr__(self) -> str:
        return f"Field({self.order})"

    # -- element constructors ------------------------------------------------

    def __call__(self, value: int) -> "FieldElement":
        return FieldElement(self, value % self.order)

    def zero(self) -> "FieldElement":
        return FieldElement(self, 0)

    def one(self) -> "FieldElement":
        return FieldElement(self, 1)

    def generator(self) -> "FieldElement":
        """Generator with order 2^119 subgroup reach (ref: field/field.rs:41-44)."""
        assert self.order == FIELD_PRIME, (
            "generator only known for 1 + 407*2^119"
        )
        return FieldElement(self, _GENERATOR_VALUE)

    def smallest_generator(self) -> "FieldElement":
        """Smallest k >= 3 coprime to p-1 (ref: field/field.rs:46-56).

        (Used as the Rescue-Prime S-box exponent alpha.)
        """
        k = 3
        while gcd(k, self.order - 1) != 1:
            k += 1
        return FieldElement(self, k)

    def primitive_nth_root(self, n: int) -> "FieldElement":
        """Primitive n-th root of unity for power-of-two n <= 2^119
        (ref: field/field.rs:58-71)."""
        assert n & (n - 1) == 0 and n <= (1 << 119), (
            "no roots for n > 2^119 or non-power-of-two"
        )
        root = _GENERATOR_VALUE
        order = 1 << 119
        while order != n:
            root = root * root % self.order
            order //= 2
        return FieldElement(self, root)

    def sample(self, data: bytes) -> "FieldElement":
        """Hash-to-field: fold bytes big-endian into a u128 (with 128-bit
        overflow wraparound, so only the last 16 bytes matter), then reduce
        (ref: field/field.rs:87-99)."""
        acc = int.from_bytes(data, "big") % (1 << 128)
        return FieldElement(self, acc % self.order)

    # -- scalar modular kernel ----------------------------------------------

    def inv(self, a: int) -> int:
        """Modular inverse with the reference convention inv(0) == 0
        (ref: field/field.rs:160-169)."""
        if a == 0:
            return 0
        return pow(a, -1, self.order)


@dataclass(frozen=True, eq=False)
class FieldElement:
    """Immutable host field element (ref: field/field_element.rs:7-143)."""

    field: Field
    value: int

    # equality only compares value + field order
    def __eq__(self, other) -> bool:
        if isinstance(other, FieldElement):
            return self.value == other.value and self.field.order == other.field.order
        return NotImplemented

    def __hash__(self) -> int:
        return hash((self.field.order, self.value))

    def __repr__(self) -> str:
        return str(self.value)

    def __str__(self) -> str:
        return str(self.value)

    def is_zero(self) -> bool:
        return self.value == 0

    def inverse(self) -> "FieldElement":
        return FieldElement(self.field, self.field.inv(self.value))

    def to_bytes(self) -> bytes:
        """Decimal-string byte encoding — this exact encoding feeds Merkle leaf
        hashing (ref: field/field_element.rs:46-50 via merkle_root.rs:28)."""
        return str(self.value).encode()

    def to_be_bytes(self) -> bytes:
        """16-byte big-endian encoding used by the proof wire format
        (ref: stark/proof_stream_enum.rs:86)."""
        return self.value.to_bytes(16, "big")

    # -- operators -----------------------------------------------------------

    def __add__(self, other: "FieldElement") -> "FieldElement":
        return FieldElement(self.field, (self.value + other.value) % self.field.order)

    def __sub__(self, other: "FieldElement") -> "FieldElement":
        return FieldElement(self.field, (self.value - other.value) % self.field.order)

    def __mul__(self, other: "FieldElement") -> "FieldElement":
        return FieldElement(self.field, self.value * other.value % self.field.order)

    def __truediv__(self, other: "FieldElement") -> "FieldElement":
        assert other.value != 0, "divide by zero"
        return self * other.inverse()

    def __neg__(self) -> "FieldElement":
        return FieldElement(self.field, (-self.value) % self.field.order)

    def __pow__(self, exponent: int) -> "FieldElement":
        return FieldElement(self.field, pow(self.value, exponent, self.field.order))

    # The reference overloads ^ for pow (ref: field/field_element.rs:108-143);
    # keep it as an alias for drop-in test parity.
    def __xor__(self, exponent: int) -> "FieldElement":
        return self.__pow__(exponent)
