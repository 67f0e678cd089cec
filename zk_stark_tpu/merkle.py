"""Merkle commitments over BLAKE2b-512.

Capability equivalent of the reference (ref: /root/reference/src/merkle_root.rs:4-96)
with identical bytes: leaves are hashed as the *decimal-string* encoding of
field elements (ref: field_element.rs:46-50), inner nodes are
``blake2b512(left + right)``, and a single-leaf tree's root is the leaf hash
itself (ref: merkle_root.rs:7-19).

Redesign: the reference recomputes subtree hashes recursively for every
``open`` call (O(n) hashing per opening).  We build the layer stack once per
codeword (O(n) total) and answer every opening in O(log n) lookups.  The
bulk leaf-hash loop is the batch boundary that later moves on-device.
"""

from __future__ import annotations

from typing import Sequence, Union

import numpy as np

from .utils.hashing import blake2b512


def leaf_bytes_from_int(value: int) -> bytes:
    """Protocol leaf encoding of a field element: decimal string bytes."""
    return str(value).encode()


class NativeMerkleTree:
    """Merkle tree over field elements backed by the C++ runtime module.

    Layers live in one contiguous byte blob (64-byte nodes, bottom-up) built
    by zkstark_native.merkle_layers: decimal-encode + BLAKE2b-512 every leaf
    and hash all levels, threaded across cores.  Byte-identical to
    :class:`MerkleTree` built from the same values.
    """

    __slots__ = ("blob", "n", "_offsets")

    def __init__(self, blob: bytes, n: int):
        self.blob = blob
        self.n = n
        offsets = []
        off, level = 0, n
        while level >= 1:
            offsets.append(off)
            off += level * 64
            if level == 1:
                break
            level //= 2
        self._offsets = offsets

    @property
    def root(self) -> bytes:
        return self.blob[-64:]

    def open(self, index: int) -> list[bytes]:
        assert 0 <= index < self.n
        path = []
        for level, off in enumerate(self._offsets[:-1]):
            sib = index ^ 1
            path.append(self.blob[off + sib * 64 : off + sib * 64 + 64])
            index >>= 1
        return path


def tree_from_canonical_limbs(
    limbs: np.ndarray,
) -> Union["MerkleTree", NativeMerkleTree]:
    """Build a tree from canonical (non-Montgomery) uint32 [n, 8] limbs.

    Uses the native module when available; falls back to the Python tree.
    """
    from .native import get as get_native

    nat = get_native()
    n = int(limbs.shape[0])
    if nat is not None and n >= 2:
        blob = nat.merkle_layers(
            np.ascontiguousarray(limbs, dtype=np.uint32).tobytes()
        )
        return NativeMerkleTree(blob, n)
    from .ops.limbs import limbs_to_ints

    return MerkleTree.from_ints([int(v) for v in limbs_to_ints(limbs)])


class MerkleTree:
    """Layered Merkle tree over pre-encoded leaf byte strings."""

    __slots__ = ("layers",)

    def __init__(self, leaf_data: Sequence[bytes]):
        n = len(leaf_data)
        assert n > 0 and n & (n - 1) == 0, "leaf count must be a power of two"
        level = [blake2b512(d) for d in leaf_data]
        layers = [level]
        while len(level) > 1:
            level = [
                blake2b512(level[i] + level[i + 1])
                for i in range(0, len(level), 2)
            ]
            layers.append(level)
        self.layers = layers

    @classmethod
    def from_ints(cls, values: Sequence[int]) -> "MerkleTree":
        return cls([leaf_bytes_from_int(v) for v in values])

    @property
    def root(self) -> bytes:
        return self.layers[-1][0]

    def open(self, index: int) -> list[bytes]:
        """Sibling path bottom-up (ref: merkle_root.rs:34-53)."""
        n = len(self.layers[0])
        assert 0 <= index < n, "cannot open invalid index"
        path = []
        for level in self.layers[:-1]:
            path.append(level[index ^ 1])
            index >>= 1
        return path


def commit(leaf_data: Sequence[bytes]) -> bytes:
    return MerkleTree(leaf_data).root


def commit_ints(values: Sequence[int]) -> bytes:
    return MerkleTree.from_ints(values).root


def open_ints(index: int, values: Sequence[int]) -> list[bytes]:
    return MerkleTree.from_ints(values).open(index)


def verify(root: bytes, index: int, path: Sequence[bytes], leaf_data: bytes) -> bool:
    """Recompute root from a leaf and its sibling path
    (ref: merkle_root.rs:69-95)."""
    assert index < (1 << len(path)), "cannot verify invalid index"
    node = blake2b512(leaf_data)
    for sibling in path:
        if index % 2 == 0:
            node = blake2b512(node + sibling)
        else:
            node = blake2b512(sibling + node)
        index >>= 1
    return node == root


def verify_int(root: bytes, index: int, path: Sequence[bytes], value: int) -> bool:
    return verify(root, index, path, leaf_bytes_from_int(value))
