"""Host polynomial parity tests (ref: field/polynomial.rs tests)."""

from zk_stark_tpu.field import Field
from zk_stark_tpu.poly import MPolynomial, Polynomial

F = Field()


def test_degree():
    assert Polynomial(F, [0, 0]).degree() is None
    assert Polynomial(F, [0, 0, 1, 0]).degree() == 2
    assert Polynomial(F, []).degree() is None


def test_sub():
    a = Polynomial(F, [5, 6])
    b = Polynomial(F, [2])
    assert (a - b).coeffs == [3, 6]


def test_divide_with_rem():
    # (ref: polynomial.rs:431-515)
    nomin = Polynomial(F, [0, 1, 3, 18, 6])
    denom = Polynomial(F, [0, 0, 3])
    q, r = nomin.divide_with_rem(denom)
    assert q == Polynomial(F, [1, 6, 2])
    assert r == Polynomial(F, [0, 1, 0, 0, 0])


def test_evaluate():
    poly = Polynomial(F, [5, 0, 10])
    assert poly.evaluate(3) == 95


def test_interpolate():
    poly = Polynomial.interpolate_domain(F, [1, 2, 3], [1, 4, 9])
    assert poly == Polynomial(F, [0, 0, 1])

    domain = list(range(1, 7))
    values = [5, 2, 2, 1, 5, 0]
    poly = Polynomial.interpolate_domain(F, domain, values)
    for x, v in zip(domain, values):
        assert poly.evaluate(x) == v
    assert poly.evaluate(363) != 0
    assert poly.degree() == len(domain) - 1


def test_pow():
    poly = Polynomial(F, [2, 5])
    assert poly**2 == Polynomial(F, [4, 20, 25])


def test_scale():
    poly = Polynomial(F, [10, 345, 0, 65, 74, 5])
    assert poly.scale(4) == Polynomial(F, [10, 1380, 0, 4160, 18944, 5120])


def test_zerofier():
    domain = [10, 345, 0, 65, 74, 5]
    z = Polynomial.zerofier_domain(F, domain)
    for d in domain:
        assert z.evaluate(d) == 0
    assert z.degree() == len(domain)


def test_colinearity():
    assert Polynomial.test_colinearity(F, [(0, 1), (1, 3), (2, 5)])
    assert not Polynomial.test_colinearity(F, [(0, 1), (1, 3), (2, 6)])


def test_true_division():
    a = Polynomial(F, [1, 2, 1])  # (x+1)^2
    b = Polynomial(F, [1, 1])
    assert a / b == b
    try:
        Polynomial(F, [1, 0, 1]) / b
        raise AssertionError("expected inexact division to raise")
    except ValueError:
        pass
