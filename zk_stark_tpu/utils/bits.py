"""Bit-twiddling helpers (host).

Replaces the reference ``BitIter`` machinery (ref: /root/reference/src/utils/bit_iter.rs:5-85)
with plain integer helpers.  The quirky semantics that matter for protocol parity are kept:

* ``bit_count(v)`` mirrors ``BitIter::count()``: the number of bits emitted when
  iterating from the top set bit down to bit 0.  For v == 0 the reference still
  emits one bit, so ``bit_count(0) == 1``.
* The reference sizes domains as ``1 << bit_count(v)`` (ref: stark/stark.rs:87),
  which is *strictly greater* than v even for exact powers of two.
"""

from __future__ import annotations

import numpy as np


def bit_count(v: int) -> int:
    """Number of bits from the top set bit down to bit 0; 1 for v == 0.

    Mirrors ``BitIter::count()`` (ref: utils/bit_iter.rs:26-58 + Iterator impl).
    """
    if v == 0:
        return 1
    return v.bit_length()


def bit_index(v: int) -> int:
    """Index of the top set bit; 0 for v == 0 (ref: BitIter::bit_index)."""
    if v == 0:
        return 0
    return v.bit_length() - 1


def next_pow2(v: int) -> int:
    """Smallest power of two >= v (v >= 1)."""
    return 1 << (v - 1).bit_length() if v > 1 else 1


def is_pow2(v: int) -> bool:
    return v > 0 and (v & (v - 1)) == 0


def bit_reverse_indices(n: int) -> np.ndarray:
    """Permutation ``perm`` with ``perm[k] = reverse of k in log2(n) bits``.

    ``x[bit_reverse_indices(n)]`` is the bit-reversal copy used as NTT stage 0
    (ref: utils/bit_reverse_copy.rs:3-34).
    """
    assert is_pow2(n)
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint64)
    rev = np.zeros_like(idx)
    for _ in range(bits):
        rev = (rev << 1) | (idx & 1)
        idx >>= 1
    return rev.astype(np.int32)
