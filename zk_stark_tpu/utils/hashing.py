"""Host-side hash primitives for transcript and Merkle hashing.

TPU-native equivalents of the reference crypto layer
(ref: /root/reference/src/crypto/blake2b512.rs:4-14 and
 /root/reference/src/crypto/shake256.rs:5-19).

These are transcript-rate operations (tiny inputs, sequential dependency via
Fiat-Shamir), so they run on the host; the bulk Merkle leaf hashing path is
batched in ``zk_stark_tpu.merkle``.
"""

from __future__ import annotations

import hashlib

#: Number of challenge bytes squeezed from the Fiat-Shamir sponge
#: (ref: crypto/shake256.rs:5).
PROOF_BYTES = 32


def blake2b512(data: bytes) -> bytes:
    """64-byte BLAKE2b digest (ref: crypto/blake2b512.rs:4-14)."""
    return hashlib.blake2b(data, digest_size=64).digest()


def shake256(data: bytes, num_bytes: int) -> bytes:
    """SHAKE-256 XOF squeezing ``num_bytes`` (ref: crypto/shake256.rs:7-19)."""
    return hashlib.shake_256(data).digest(num_bytes)
