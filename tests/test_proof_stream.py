"""Proof stream wire format and Fiat-Shamir tests
(ref: proof_stream.rs + stark/proof_stream_enum.rs + stark.rs:784-808)."""

from zk_stark_tpu.field import Field, FIELD_PRIME
from zk_stark_tpu.proof_stream import (
    Codeword,
    Leafs,
    Path,
    ProofStream,
    Root,
    SignatureProofStream,
    Value,
    digest_items,
)

F = Field()

ITEMS = [
    Root(bytes([0x49, 0x6E, 0x20, 0x74])),
    Codeword((20, 100)),
    Path((bytes([0x49, 0x6E, 0x20, 0x74]), bytes([0x1, 0x6B, 0xFE, 0x25]))),
    Leafs((1, 5, 10)),
    Value(2),
]


def test_serialize_roundtrip():
    ps = ProofStream(F, list(ITEMS))
    back = ProofStream.deserialize(ps.serialize(), F)
    assert back.items == ps.items


def test_wire_format_layout():
    data = digest_items(ITEMS, FIELD_PRIME)
    # 16-byte BE field order header
    assert data[:16] == FIELD_PRIME.to_bytes(16, "big")
    # first record: code 0, size 4, payload
    assert data[16] == 0
    assert int.from_bytes(data[17:25], "big") == 4
    assert data[25:29] == bytes([0x49, 0x6E, 0x20, 0x74])
    # second record: codeword, 2 x 16-byte BE elements
    assert data[29] == 1
    assert int.from_bytes(data[30:38], "big") == 32
    assert int.from_bytes(data[38:54], "big") == 20


def test_field_header_zero_without_field_items():
    data = digest_items([Root(b"ab")], FIELD_PRIME)
    assert data[:16] == bytes(16)


def test_pull_order_and_fiat_shamir_consistency():
    ps = ProofStream(F, list(ITEMS))
    # prover channel hashes the full transcript; the verifier channel hashes
    # only what was read so far — they agree after everything is pulled
    full = ps.fiat_shamir_prover(32)
    assert ps.fiat_shamir_verifier(32) != full
    for _ in range(len(ITEMS)):
        ps.pull()
    assert ps.fiat_shamir_verifier(32) == full


def test_signature_stream_prefix_changes_challenges():
    ps1 = SignatureProofStream(F, b"document A", list(ITEMS))
    ps2 = SignatureProofStream(F, b"document B", list(ITEMS))
    plain = ProofStream(F, list(ITEMS))
    assert ps1.fiat_shamir_prover(32) != ps2.fiat_shamir_prover(32)
    assert ps1.fiat_shamir_prover(32) != plain.fiat_shamir_prover(32)
    # serialization does not include the prefix
    assert ps1.serialize() == plain.serialize()
