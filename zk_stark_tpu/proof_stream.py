"""Fiat-Shamir proof stream and the binary proof wire format.

Byte-for-byte equivalent of the reference transcript machinery:
* item payload encodings (ref: /root/reference/src/stark/proof_stream_enum.rs:17-127),
* the transcript digest format — 16-byte big-endian field order header, then
  ``code(1B) || size(8B BE) || payload`` records
  (ref: stark/proof_stream_enum.rs:161-190),
* prover/verifier Fiat-Shamir = SHAKE-256 over the (partial) digest
  (ref: proof_stream.rs:36-48),
* the signature variant that prepends ``len(prefix)(8B BE) || prefix`` with
  ``prefix = blake2b512(document)``
  (ref: rescue_prime/proof_stream.rs:9-62).

The serialized digest *is* the proof format (ref: stark/stark.rs:30-67), and
it also feeds Fiat-Shamir — any drift breaks proofs invisibly, so this module
is host-side and deliberately boring.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Union

from .field import Field
from .utils.hashing import blake2b512, shake256

# -----------------------------------------------------------------------------
# Proof items (ref: proof_stream_enum.rs:8-14)
# -----------------------------------------------------------------------------


@dataclass(frozen=True)
class Root:
    data: bytes


@dataclass(frozen=True)
class Codeword:
    values: tuple[int, ...]


@dataclass(frozen=True)
class Path:
    entries: tuple[bytes, ...]


@dataclass(frozen=True)
class Leafs:
    values: tuple[int, int, int]


@dataclass(frozen=True)
class Value:
    value: int


ProofItem = Union[Root, Codeword, Path, Leafs, Value]

_U64 = 8
_U128 = 16


def _item_to_bytes(item: ProofItem) -> tuple[int, bytes, bool]:
    """Returns (code, payload, carries_field) per the reference wire format."""
    if isinstance(item, Root):
        return 0, item.data, False
    if isinstance(item, Codeword):
        payload = b"".join(v.to_bytes(_U128, "big") for v in item.values)
        return 1, payload, len(item.values) > 0
    if isinstance(item, Path):
        payload = b"".join(
            len(e).to_bytes(_U64, "big") + e for e in item.entries
        )
        return 2, payload, False
    if isinstance(item, Leafs):
        payload = b"".join(v.to_bytes(_U128, "big") for v in item.values)
        return 3, payload, True
    if isinstance(item, Value):
        return 4, item.value.to_bytes(_U128, "big"), True
    raise TypeError(f"unknown proof item {item!r}")


def _item_from_bytes(code: int, payload: bytes) -> ProofItem:
    if code == 0:
        return Root(payload)
    if code == 1:
        assert len(payload) % _U128 == 0, "incorrect codeword payload size"
        return Codeword(
            tuple(
                int.from_bytes(payload[i : i + _U128], "big")
                for i in range(0, len(payload), _U128)
            )
        )
    if code == 2:
        entries, pos = [], 0
        while pos + _U64 <= len(payload):
            size = int.from_bytes(payload[pos : pos + _U64], "big")
            pos += _U64
            if pos + size > len(payload):
                raise ValueError("path entry overruns payload")
            entries.append(payload[pos : pos + size])
            pos += size
        if pos != len(payload):
            raise ValueError("trailing bytes in path payload")
        return Path(tuple(entries))
    if code == 3:
        assert len(payload) == 3 * _U128, "leafs must hold 3 elements"
        return Leafs(
            tuple(
                int.from_bytes(payload[i : i + _U128], "big")
                for i in range(0, 3 * _U128, _U128)
            )
        )
    if code == 4:
        assert len(payload) == _U128, "incorrect value payload size"
        return Value(int.from_bytes(payload, "big"))
    raise ValueError(f"unknown proof item code {code}")


def digest_items(items: Sequence[ProofItem], field_order: int) -> bytes:
    """Transcript digest (ref: proof_stream_enum.rs:161-190)."""
    records = []
    carries = False
    for item in items:
        code, payload, has_field = _item_to_bytes(item)
        carries = carries or has_field
        records.append(
            bytes([code]) + len(payload).to_bytes(_U64, "big") + payload
        )
    header = (field_order if carries else 0).to_bytes(_U128, "big")
    return header + b"".join(records)


def deserialize_items(data: bytes, field: Field) -> list[ProofItem]:
    """Parse a serialized proof (ref: stark/stark.rs:30-67)."""
    order = int.from_bytes(data[:_U128], "big")
    if order != 0 and order != field.order:
        raise ValueError("serialized field differs from Stark's field")
    items, pos = [], _U128
    while pos < len(data):
        code = data[pos]
        pos += 1
        size = int.from_bytes(data[pos : pos + _U64], "big")
        pos += _U64
        items.append(_item_from_bytes(code, data[pos : pos + size]))
        pos += size
    return items


# -----------------------------------------------------------------------------
# Proof streams (ref: proof_stream.rs:6-78)
# -----------------------------------------------------------------------------


class ProofStream:
    """Append-only transcript with independent read cursor.

    The wire encoding of every item is cached incrementally: the transcript
    is append-only (``push`` is the only mutator), so each item is encoded
    exactly once and every Fiat-Shamir draw — prover (full transcript) or
    verifier (prefix up to ``read_index``) — reuses the running buffer
    instead of re-serializing O(proof bytes) per challenge.  The produced
    bytes are identical to :func:`digest_items` (pinned by the proof
    fixture tests).
    """

    def __init__(self, field: Field, items: Optional[list[ProofItem]] = None):
        self.field = field
        self.items: list[ProofItem] = list(items) if items else []
        self.read_index = 0
        # incremental encoder state: records buffer, per-item end offsets,
        # index of the first field-carrying item (the header depends on it
        # and carrying is monotone once true)
        self._enc_buf = bytearray()
        self._enc_offsets: list[int] = [0]
        self._first_carry: Optional[int] = None

    def push(self, item: ProofItem) -> None:
        self.items.append(item)

    def _digest_prefix(self, k: int) -> bytes:
        """Transcript digest of ``items[:k]``, from the incremental cache.

        Byte-identical to ``digest_items(self.items[:k], self.field.order)``
        (ref: proof_stream_enum.rs:161-190).
        """
        while len(self._enc_offsets) - 1 < k:
            i = len(self._enc_offsets) - 1
            code, payload, has_field = _item_to_bytes(self.items[i])
            if has_field and self._first_carry is None:
                self._first_carry = i
            self._enc_buf += bytes([code])
            self._enc_buf += len(payload).to_bytes(_U64, "big")
            self._enc_buf += payload
            self._enc_offsets.append(len(self._enc_buf))
        carries = self._first_carry is not None and self._first_carry < k
        header = (self.field.order if carries else 0).to_bytes(_U128, "big")
        return header + bytes(self._enc_buf[: self._enc_offsets[k]])

    def pull(self) -> ProofItem:
        assert self.read_index < len(self.items), "cannot pull, queue is empty"
        item = self.items[self.read_index]
        self.read_index += 1
        return item

    # -- typed pulls (ref: proof_stream_enum.rs:129-158) ---------------------

    def pull_root(self) -> bytes:
        item = self.pull()
        assert isinstance(item, Root), f"expected Root, got {type(item).__name__}"
        return item.data

    def pull_codeword(self) -> tuple[int, ...]:
        item = self.pull()
        assert isinstance(item, Codeword), f"expected Codeword, got {type(item).__name__}"
        return item.values

    def pull_path(self) -> tuple[bytes, ...]:
        item = self.pull()
        assert isinstance(item, Path), f"expected Path, got {type(item).__name__}"
        return item.entries

    def pull_leafs(self) -> tuple[int, int, int]:
        item = self.pull()
        assert isinstance(item, Leafs), f"expected Leafs, got {type(item).__name__}"
        return item.values

    def pull_value(self) -> int:
        item = self.pull()
        assert isinstance(item, Value), f"expected Value, got {type(item).__name__}"
        return item.value

    # -- serialization / Fiat-Shamir ----------------------------------------

    def digest(self) -> bytes:
        return self._digest_prefix(len(self.items))

    def serialize(self) -> bytes:
        return self.digest()

    @classmethod
    def deserialize(cls, data: bytes, field: Field) -> "ProofStream":
        return cls(field, deserialize_items(data, field))

    def _fs_input(self, data: bytes) -> bytes:
        return data

    def fiat_shamir_prover(self, num_bytes: int) -> bytes:
        return shake256(self._fs_input(self.digest()), num_bytes)

    def fiat_shamir_verifier(self, num_bytes: int) -> bytes:
        partial = self._digest_prefix(self.read_index)
        return shake256(self._fs_input(partial), num_bytes)


class SignatureProofStream(ProofStream):
    """Proof stream bound to a document digest
    (ref: rescue_prime/proof_stream.rs:9-62)."""

    def __init__(self, field: Field, document: bytes, items=None):
        super().__init__(field, items)
        self.prefix = blake2b512(document)

    def _fs_input(self, data: bytes) -> bytes:
        return len(self.prefix).to_bytes(_U64, "big") + self.prefix + data
