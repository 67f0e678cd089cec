"""Native C++ runtime module parity tests (BLAKE2b + Merkle layers)."""

import hashlib
import random

import numpy as np
import pytest

from zk_stark_tpu import merkle
from zk_stark_tpu.field import FIELD_PRIME
from zk_stark_tpu.native import get as get_native
from zk_stark_tpu.ops import limbs as L

nat = get_native()

pytestmark = pytest.mark.skipif(nat is None, reason="native module unavailable")


def test_blake2b_parity():
    for data in (b"", b"\x00", b"hello", bytes(range(256)) * 5):
        assert nat.blake2b512(data) == hashlib.blake2b(
            data, digest_size=64
        ).digest()


def test_decimals():
    vals = [0, 1, 99, FIELD_PRIME - 1]
    got = nat.decimals(
        np.ascontiguousarray(L.ints_to_limbs(vals)).tobytes()
    )
    assert got == b"\n".join(str(v).encode() for v in vals)


def test_merkle_tree_parity():
    random.seed(4)
    vals = [random.randrange(FIELD_PRIME) for _ in range(64)]
    limbs = L.ints_to_limbs(vals)
    native_tree = merkle.tree_from_canonical_limbs(limbs)
    python_tree = merkle.MerkleTree.from_ints(vals)
    assert isinstance(native_tree, merkle.NativeMerkleTree)
    assert native_tree.root == python_tree.root
    for i in (0, 1, 31, 63):
        assert native_tree.open(i) == python_tree.open(i)
        assert merkle.verify_int(native_tree.root, i, native_tree.open(i), vals[i])


def test_golden_root():
    limbs = L.ints_to_limbs([5462, 456, 652, 23409])
    tree = merkle.tree_from_canonical_limbs(limbs)
    assert tree.root.hex().startswith("b36f5edab7ea2100")
