"""On-device BLAKE2b Merkle: byte parity with the host trees.

The device path (ops/blake2b_dev.py + merkle.DeviceMerkleTree) must be
bit-exact against hashlib/the host layered tree: leaves hash the decimal
string of the element (ref: /root/reference/src/merkle_root.rs:21-32), nodes
hash the 64+64-byte digest concatenation.
"""

import hashlib
import random

import numpy as np
import pytest

from zk_stark_tpu import merkle
from zk_stark_tpu.field import FIELD_PRIME as P
from zk_stark_tpu.ops import limbs as L
from zk_stark_tpu.ops.blake2b_dev import blake2b512_ints_device


def test_leaf_digest_parity():
    random.seed(7)
    vals = [0, 1, 9, 10, 99, 100, P - 1, 10**38, 10**38 - 1, 10**37] + [
        random.randrange(P) for _ in range(246)
    ]
    got = blake2b512_ints_device(vals)
    for v, g in zip(vals, got):
        assert g == hashlib.blake2b(str(v).encode(), digest_size=64).digest()


def test_device_tree_matches_host_tree():
    random.seed(8)
    vals = [random.randrange(P) for _ in range(1024)]
    limbs = np.asarray(L.ints_to_limbs(vals), dtype=np.uint32)

    host = merkle.tree_for_codeword(limbs, device=False)
    dev = merkle.tree_for_codeword(limbs, device=True)
    assert isinstance(dev, merkle.DeviceMerkleTree)

    assert dev.root == host.root
    idx = [0, 1, 2, 511, 512, 1023, 513, 37]
    assert dev.values_at(idx) == host.values_at(idx)
    assert dev.paths(idx) == host.paths(idx)
    for i in (0, 777, 1023):
        assert dev.open(i) == host.open(i)
        assert merkle.verify_int(
            dev.root, i, dev.open(i), vals[i]
        )
    assert dev.all_values() == vals


def test_fri_proof_bytes_identical_device_vs_host(monkeypatch):
    """A FRI proof produced with device Merkle commitment is byte-identical
    to the host-hashed proof (same transcript, same openings)."""
    from zk_stark_tpu.field import Field
    from zk_stark_tpu.fri import FRI
    from zk_stark_tpu.proof_stream import ProofStream

    field = Field()
    n = 1 << 10
    g = field.generator().value
    omega = field.primitive_nth_root(n).value
    fri = FRI(field, g, omega, n, 4, 17)

    random.seed(9)
    degree = n // 4 - 1
    coeffs = [random.randrange(P) for _ in range(degree + 1)] + [0] * (
        n - degree - 1
    )

    # evaluate on the coset via scale + NTT (matches fast_coset_evaluate)
    from zk_stark_tpu.ops.poly_ops import DPoly, fast_coset_evaluate

    cw_dev = fast_coset_evaluate(DPoly.from_ints(coeffs), g, omega, n)

    def run(force: bool) -> bytes:
        monkeypatch.setattr(
            merkle, "_device_merkle_enabled", lambda n: force
        )
        ps = ProofStream(field)
        fri.prove(cw_dev, ps)
        return ps.serialize()

    assert run(True) == run(False)
