"""Device limb arithmetic vs host Python-int gold (property tests).

TPU-equivalent of the reference scalar kernel tests
(ref: /root/reference/src/field/field.rs:176-217); the host field is the gold
reference, and every device op must agree on canonical integer values.
"""

import random

import numpy as np
import pytest

from zk_stark_tpu.ops import limbs as L

P = L.P
random.seed(0xD1CE)

EDGE = [0, 1, 2, P - 1, P - 2, (P - 1) // 2, L.R_INT, P - L.R_INT]
VALS_A = [random.randrange(P) for _ in range(61)] + EDGE[:3]
VALS_B = [random.randrange(P) for _ in range(61)] + EDGE[3:6]


@pytest.fixture(scope="module")
def ab():
    return L.ints_to_mont(VALS_A), L.ints_to_mont(VALS_B)


def test_roundtrip_conversion():
    vals = VALS_A + EDGE
    assert list(L.mont_to_ints(L.ints_to_mont(vals))) == vals
    # limb packing itself
    limbs = L.ints_to_limbs(vals)
    assert list(L.limbs_to_ints(limbs)) == vals


def test_mont_mul(ab):
    a, b = ab
    got = list(L.mont_to_ints(L.mont_mul_jit(a, b)))
    assert got == [x * y % P for x, y in zip(VALS_A, VALS_B)]


def test_add_sub_neg(ab):
    a, b = ab
    assert list(L.mont_to_ints(L.add_mod_jit(a, b))) == [
        (x + y) % P for x, y in zip(VALS_A, VALS_B)
    ]
    assert list(L.mont_to_ints(L.sub_mod_jit(a, b))) == [
        (x - y) % P for x, y in zip(VALS_A, VALS_B)
    ]
    assert list(L.mont_to_ints(L.neg_mod_jit(a))) == [(-x) % P for x in VALS_A]


def test_pow_small(ab):
    a, _ = ab
    for e in (0, 1, 2, 3, 7):
        got = list(L.mont_to_ints(L.mont_pow_jit(a, e)))
        assert got == [pow(x, e, P) for x in VALS_A], e


def test_pow_large_scanned(ab):
    a, _ = ab
    e = 180331931428153586757283157844700080811  # Rescue alpha_inv
    got = list(L.mont_to_ints(L.mont_pow_jit(a, e)))
    assert got == [pow(x, e, P) for x in VALS_A]


def test_batch_inv(ab):
    a, _ = ab
    got = list(L.mont_to_ints(L.batch_inv_jit(a)))
    assert got == [pow(x, -1, P) if x else 0 for x in VALS_A]


def test_is_zero():
    vals = [0, 1, 0, P - 1]
    mask = np.asarray(L.is_zero(L.ints_to_mont(vals)))
    assert list(mask) == [True, False, True, False]
