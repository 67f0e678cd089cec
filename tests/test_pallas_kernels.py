"""Interpret-mode parity for the Pallas TPU kernels (CPU-runnable).

The fused-stage NTT already has an interpret test (test_ntt_pallas.py if
present) — these cover the round-3 kernels: the FRI fold round
(ops/fold_pallas.py) and the BLAKE2b compression (ops/blake2b_dev.py
Pallas path), both bit-exact against their jnp/host references.
"""

import hashlib
import random

import jax.numpy as jnp
import numpy as np
import pytest

from zk_stark_tpu.field import FIELD_PRIME as P
from zk_stark_tpu.field import Field
from zk_stark_tpu.ops import limbs as L


def test_fold_pallas_interpret_matches_jnp():
    from zk_stark_tpu.fri import _fold_round_kernel_cached
    from zk_stark_tpu.ops import fold_pallas
    from zk_stark_tpu.ops.ntt import powers_mont
    from zk_stark_tpu.parallel.engine import DEFAULT

    field = Field()
    n = 512  # half = 256 -> two [128]-lane rows
    random.seed(7)
    omega = field.primitive_nth_root(n).value
    cw = L.ints_to_mont([random.randrange(P) for _ in range(n)])
    invpows = powers_mont(pow(omega, -1, P), n // 2)
    ao = L.int_to_mont(98765 * pow(field.generator().value, -1, P) % P)
    two_inv = L.int_to_mont(pow(2, -1, P))

    f_ref, c_ref = _fold_round_kernel_cached(n, DEFAULT)(
        cw, invpows, ao, two_inv
    )

    fold_pallas.INTERPRET = True
    try:
        assert fold_pallas.fold_supported(n)
        f_p, c_p = fold_pallas.fold_round_pallas(n)(cw, invpows, ao, two_inv)
    finally:
        fold_pallas.INTERPRET = False
    assert bool(jnp.all(f_p == f_ref))
    assert bool(jnp.all(c_p == c_ref))


def test_blake2b_pallas_interpret_parity():
    from zk_stark_tpu.ops import blake2b_dev as B

    random.seed(8)
    vals = [0, 1, 9, 10, 10**38, P - 1] + [
        random.randrange(P) for _ in range(250)
    ]
    B.INTERPRET = True
    try:
        got = B.blake2b512_ints_device(vals)  # 256 values: pad path + grid
    finally:
        B.INTERPRET = False
    exp = [hashlib.blake2b(str(v).encode()).digest() for v in vals]
    assert got == exp


def test_node_compression_pallas_interpret_parity():
    from zk_stark_tpu.ops import blake2b_dev as B

    random.seed(9)
    vals = [random.randrange(P) for _ in range(256)]
    B.INTERPRET = True
    try:
        leaves = B.leaf_digests_packed(
            jnp.asarray(L.ints_to_limbs(vals))
        )
        parents = B.packed_to_digest_np(B.node_digests_packed(leaves))
    finally:
        B.INTERPRET = False
    leaf_bytes = [hashlib.blake2b(str(v).encode()).digest() for v in vals]
    exp = [
        hashlib.blake2b(leaf_bytes[2 * i] + leaf_bytes[2 * i + 1]).digest()
        for i in range(128)
    ]
    assert [parents[i].tobytes() for i in range(128)] == exp
