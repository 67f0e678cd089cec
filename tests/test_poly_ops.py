"""Device polynomial ops vs host gold (ref: fft/ntt_arithmetics.rs tests)."""

import random

import pytest

from zk_stark_tpu.field import Field, FIELD_PRIME as P
from zk_stark_tpu.ops import limbs as L
from zk_stark_tpu.ops import poly_ops as PO
from zk_stark_tpu.poly import Polynomial

F = Field()
random.seed(42)
N = 64
ROOT = F.primitive_nth_root(N).value


def rand_coeffs(max_len):
    return [random.randrange(P) for _ in range(random.randrange(1, max_len))]


def test_fast_multiply_matches_schoolbook():
    for trial in range(5):
        la, lb = rand_coeffs(N // 2), rand_coeffs(N // 2)
        host = Polynomial(F, la) * Polynomial(F, lb)
        dev = PO.fast_multiply(
            PO.DPoly.from_ints(la), PO.DPoly.from_ints(lb), ROOT, N
        )
        assert Polynomial(F, dev.to_ints()) == host, trial


def test_zerofier_first_k():
    for nn, k in [(16, 5), (16, 16), (128, 27), (128, 1)]:
        rt = F.primitive_nth_root(nn).value
        dom = [pow(rt, i, P) for i in range(k)]
        host = Polynomial.zerofier_domain(F, dom)
        dev = PO.zerofier_first_k(rt, nn, k)
        assert Polynomial(F, dev.to_ints()) == host, (nn, k)


def test_interpolate_first_k():
    for nn, k in [(16, 5), (16, 16), (128, 27), (128, 1), (128, 2)]:
        rt = F.primitive_nth_root(nn).value
        dom = [pow(rt, i, P) for i in range(k)]
        vals = [random.randrange(P) for _ in range(k)]
        host = Polynomial.interpolate_domain(F, dom, vals)
        dev = PO.interpolate_first_k(rt, nn, k, L.ints_to_mont(vals))
        assert Polynomial(F, dev.to_ints()) == host, (nn, k)


def test_fast_coset_evaluate():
    # (ref: ntt_arithmetics.rs:472-492)
    off = 5
    coeffs = [random.randrange(P) for _ in range(50)]
    cw = PO.fast_coset_evaluate(PO.DPoly.from_ints(coeffs), off, ROOT, N)
    host = Polynomial(F, coeffs)
    want = [host.evaluate(off * pow(ROOT, i, P) % P) for i in range(N)]
    assert list(L.mont_to_ints(cw)) == want


def test_fast_coset_divide():
    # (ref: ntt_arithmetics.rs:495-517)
    g = F.generator().value
    for trial in range(3):
        la, lb = rand_coeffs(N // 2), rand_coeffs(N // 2)
        a, b = PO.DPoly.from_ints(la), PO.DPoly.from_ints(lb)
        if a.is_zero():
            continue
        prod = PO.fast_multiply(a, b, ROOT, N)
        div = PO.fast_coset_divide(prod, a, g, ROOT, N)
        assert Polynomial(F, div.to_ints()) == Polynomial(F, lb), trial


def test_dpoly_basics():
    d = PO.DPoly.from_ints([1, 2, 0, 3, 0, 0])
    assert d.degree() == 3
    assert PO.DPoly.from_ints([0, 0]).degree() is None
    assert d.evaluate(7) == (1 + 2 * 7 + 3 * 343) % P
    assert Polynomial(F, d.scale(4).to_ints()) == Polynomial(
        F, [1, 8, 0, 192, 0, 0]
    )
    assert d.shift(2).to_ints()[:3] == [0, 0, 1]
    s = d + PO.DPoly.from_ints([5])
    assert s.to_ints()[0] == 6
    n = -d
    assert n.to_ints()[0] == P - 1


def test_cumprod():
    vals = [random.randrange(1, P) for _ in range(37)]
    got = list(L.mont_to_ints(PO.cumprod_mont(L.ints_to_mont(vals))))
    want, acc = [], 1
    for v in vals:
        acc = acc * v % P
        want.append(acc)
    assert got == want


def test_fast_zerofier_arbitrary_domain():
    # (ref test: ntt_arithmetics.rs:377-403) zerofier vanishes on its domain
    vals = [random.randrange(1, P) for _ in range(13)]
    z = PO.fast_zerofier(L.ints_to_mont(vals), ROOT, N)
    host = Polynomial.zerofier_domain(F, vals)
    assert Polynomial(F, z.to_ints()) == host


def test_fast_evaluate_domain_arbitrary():
    # (ref test: ntt_arithmetics.rs:406-432)
    coeffs = [random.randrange(P) for _ in range(40)]
    domain = [random.randrange(P) for _ in range(19)]
    got = list(L.mont_to_ints(
        PO.fast_evaluate_domain(PO.DPoly.from_ints(coeffs), L.ints_to_mont(domain))
    ))
    host = Polynomial(F, coeffs)
    assert got == [host.evaluate(x) for x in domain]


def test_fast_interpolate_domain_dispatch():
    # structured domain -> device path; arbitrary -> exact Lagrange
    k = 11
    dom_struct = [pow(ROOT, i, P) for i in range(k)]
    vals = [random.randrange(P) for _ in range(k)]
    a = PO.fast_interpolate_domain(F, dom_struct, vals, ROOT, N)
    b = Polynomial.interpolate_domain(F, dom_struct, vals)
    assert Polynomial(F, a.to_ints()) == b

    dom_rand = [random.randrange(1, P) for _ in range(7)]
    vals = [random.randrange(P) for _ in range(7)]
    c = PO.fast_interpolate_domain(F, dom_rand, vals, ROOT, N)
    d = Polynomial.interpolate_domain(F, dom_rand, vals)
    assert Polynomial(F, c.to_ints()) == d
