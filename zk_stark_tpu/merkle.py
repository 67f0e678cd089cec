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

import os
from typing import Sequence, Union

import numpy as np

from .utils.hashing import blake2b512


def leaf_bytes_from_int(value: int) -> bytes:
    """Protocol leaf encoding of a field element: decimal string bytes."""
    return str(value).encode()


class DeviceMerkleTree:
    """Merkle tree hashed on device (ops.blake2b_dev), byte-identical to the
    host trees.

    Levels of digest *words* stay on device; only the tiny top of the tree
    (<= ``cutoff`` nodes) moves to the host.  Queried values and sibling
    paths are gathered on device, so committing a 2^20 codeword transfers
    64 bytes (the root) instead of 32 MB (the canonical array) — and the
    ~2n BLAKE2b compressions run as batched VPU work instead of host loops.

    ``canon_dev`` is the canonical (non-Montgomery) uint32[n, 8] limb array;
    the tree keeps a reference to answer value queries at opened indices.
    """

    __slots__ = ("n", "canon_dev", "_dev_levels", "_host_layers", "_nlev")

    def __init__(self, canon_dev, cutoff: int = 256):
        from .ops import blake2b_dev as B

        n = int(canon_dev.shape[0])
        assert n >= 2 and n & (n - 1) == 0, "leaf count must be a power of two"
        cutoff = min(cutoff, n)
        self.n = n
        self.canon_dev = canon_dev

        # ONE device dispatch builds every level down to the cutoff
        self._dev_levels = _tree_builder(n, cutoff)(canon_dev)
        self._nlev = len(self._dev_levels) - 1  # levels queried for siblings

        hhi, hlo = self._dev_levels[-1]
        mat = B.words_to_digest_np(hhi, hlo)
        level = [mat[i].tobytes() for i in range(mat.shape[0])]
        host_layers = [level]
        while len(level) > 1:
            level = [
                blake2b512(level[i] + level[i + 1])
                for i in range(0, len(level), 2)
            ]
            host_layers.append(level)
        self._host_layers = host_layers

    @property
    def root(self) -> bytes:
        return self._host_layers[-1][0]

    def paths(self, indices: Sequence[int]) -> list[list[bytes]]:
        """Batched openings: ONE device gather dispatch for all sibling
        digests below the cutoff; tiny host lookups above it."""
        import jax.numpy as jnp

        from .ops import blake2b_dev as B

        k = len(indices)
        if self._nlev:
            sibs = jnp.asarray(
                [
                    [(i >> lvl) ^ 1 for i in indices]
                    for lvl in range(self._nlev)
                ],
                dtype=jnp.int32,
            )
            ghi, glo = _path_gather(self.n, self._nlev, k)(
                tuple(self._dev_levels[:-1]), sibs
            )
            mat = B.words_to_digest_np(ghi, glo)  # [nlev * k, 64]
            per_level_bytes = [
                [mat[lvl * k + j].tobytes() for j in range(k)]
                for lvl in range(self._nlev)
            ]
        else:
            per_level_bytes = []

        out = []
        for j, index in enumerate(indices):
            path = [per_level_bytes[lvl][j] for lvl in range(self._nlev)]
            idx = index >> self._nlev
            for layer in self._host_layers[:-1]:
                path.append(layer[idx ^ 1])
                idx >>= 1
            out.append(path)
        return out

    def open(self, index: int) -> list[bytes]:
        return self.paths([index])[0]

    def values_at(self, indices: Sequence[int]) -> list[int]:
        import jax.numpy as jnp

        from .ops.limbs import limbs_to_ints

        rows = np.asarray(
            self.canon_dev[jnp.asarray(list(indices), dtype=jnp.int32)]
        )
        return [int(v) for v in limbs_to_ints(rows)]

    def all_values(self) -> list[int]:
        from .ops.limbs import limbs_to_ints

        return [int(v) for v in limbs_to_ints(np.asarray(self.canon_dev))]


import functools


@functools.lru_cache(maxsize=None)
def _tree_builder(n: int, cutoff: int):
    """Jitted full tree build: canonical limbs [n, 8] -> tuple of digest-word
    levels ((hhi, hlo) of [8, n], [8, n/2], ..., [8, cutoff])."""
    import jax

    from .ops import blake2b_dev as B

    def build(canon):
        hhi, hlo = B._leaf_kernel(canon)
        levels = [(hhi, hlo)]
        m = n
        while m > cutoff:
            hhi, hlo = B._node_kernel(hhi, hlo)
            m //= 2
            levels.append((hhi, hlo))
        return tuple(levels)

    return jax.jit(build)


@functools.lru_cache(maxsize=None)
def _path_gather(n: int, nlev: int, k: int):
    """Jitted batched sibling gather: levels + sibs [nlev, k] ->
    (hhi, hlo) of [8, nlev * k] (level-major)."""
    import jax
    import jax.numpy as jnp

    def gather(levels, sibs):
        ghi = jnp.concatenate(
            [levels[l][0][:, sibs[l]] for l in range(nlev)], axis=1
        )
        glo = jnp.concatenate(
            [levels[l][1][:, sibs[l]] for l in range(nlev)], axis=1
        )
        return ghi, glo

    return jax.jit(gather)


def _device_merkle_enabled(n: int) -> bool:
    flag = os.environ.get("ZK_STARK_TPU_DEVICE_MERKLE")
    if flag is not None:
        return flag not in ("0", "")
    import jax

    return jax.default_backend() != "cpu" and n >= 4096


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


class HostCodewordTree:
    """Host tree (native C++ or Python) + canonical limbs, with the same
    query interface as :class:`DeviceMerkleTree`."""

    __slots__ = ("limbs", "tree", "n")

    def __init__(self, limbs: np.ndarray, tree):
        self.limbs = limbs
        self.tree = tree
        self.n = int(limbs.shape[0])

    @property
    def root(self) -> bytes:
        return self.tree.root

    def open(self, index: int) -> list[bytes]:
        return self.tree.open(index)

    def paths(self, indices: Sequence[int]) -> list[list[bytes]]:
        return [self.tree.open(i) for i in indices]

    def values_at(self, indices: Sequence[int]) -> list[int]:
        from .ops.limbs import row_to_int

        return [row_to_int(self.limbs[i]) for i in indices]

    def all_values(self) -> list[int]:
        from .ops.limbs import limbs_to_ints

        return [int(v) for v in limbs_to_ints(self.limbs)]


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


def tree_for_codeword(
    canon, device: bool | None = None
) -> Union[DeviceMerkleTree, HostCodewordTree]:
    """Commit to a canonical uint32[n, 8] codeword, device or host.

    ``canon`` may be a device array (stays on device when the device path is
    chosen — no full-codeword transfer) or a host ndarray.  ``device`` forces
    the choice; default policy: device hashing on accelerators for
    n >= 4096, host (threaded C++) otherwise / on CPU
    (override: ZK_STARK_TPU_DEVICE_MERKLE=0/1).
    """
    n = int(canon.shape[0])
    if device is None:
        device = _device_merkle_enabled(n)
    if device and n >= 2:
        import jax.numpy as jnp

        return DeviceMerkleTree(jnp.asarray(canon))
    limbs = np.asarray(canon)
    return HostCodewordTree(limbs, tree_from_canonical_limbs(limbs))


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
