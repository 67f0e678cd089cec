"""Multivariate polynomial parity tests (ref: m_polynomial.rs tests)."""

from zk_stark_tpu.field import Field, FIELD_PRIME
from zk_stark_tpu.poly import MPolynomial, Polynomial

F = Field()


def test_is_zero():
    assert MPolynomial.constant(F, 0).is_zero()
    assert not MPolynomial.constant(F, 1).is_zero()


def test_mul():
    # (ref: m_polynomial.rs:326-350)
    poly_a = MPolynomial(F, {(0, 1, 5): 17, (42, 1, 5): 5})
    poly_b = MPolynomial(F, {(42, 0): 8, (0, 0): FIELD_PRIME - 7})
    poly_c = MPolynomial(
        F,
        {
            (42, 1, 5): (136 + 5 * (FIELD_PRIME - 7)) % FIELD_PRIME,
            (0, 1, 5): 17 * (FIELD_PRIME - 7) % FIELD_PRIME,
            (84, 1, 5): 40,
        },
    )
    assert poly_a * poly_b == poly_c


def test_add():
    poly_a = MPolynomial(F, {(0, 1, 5): 17, (5, 23, 0): 5})
    poly_b = MPolynomial(F, {(42, 0): 8, (5, 23): 12})
    poly_c = MPolynomial(F, {(0, 1, 5): 17, (5, 23, 0): 17, (42, 0, 0): 8})
    assert poly_a + poly_b == poly_c


def test_sub_neg():
    poly_a = MPolynomial(F, {(0, 1, 5): 17, (5, 23, 0): 5})
    poly_b = MPolynomial(F, {(42, 0): 8, (5, 23): 12})
    poly_c = MPolynomial(
        F, {(0, 1, 5): 17, (5, 23, 0): (5 - 12) % FIELD_PRIME,
            (42, 0, 0): (-8) % FIELD_PRIME}
    )
    assert poly_a - poly_b == poly_c
    assert -poly_a == MPolynomial(
        F, {(0, 1, 5): (-17) % FIELD_PRIME, (5, 23, 0): (-5) % FIELD_PRIME}
    )


def test_variables():
    vars3 = MPolynomial.variables(3, F)
    assert vars3[0] == MPolynomial(F, {(1, 0, 0): 1})
    assert vars3[1] == MPolynomial(F, {(0, 1, 0): 1})
    assert vars3[2] == MPolynomial(F, {(0, 0, 1): 1})


def test_lift():
    upoly = Polynomial.interpolate_domain(F, [0, 1, 2], [2, 5, 5])
    mpoly = MPolynomial.lift(upoly, 3)
    assert upoly.evaluate(5) == mpoly.evaluate([0, 0, 0, 5])


def test_evaluate_algebra():
    variables = MPolynomial.variables(4, F)
    mpoly1 = (
        MPolynomial.constant(F, 1) * variables[0]
        + MPolynomial.constant(F, 2) * variables[1]
        + MPolynomial.constant(F, 5) * (variables[2] ** 3)
    )
    mpoly2 = (
        MPolynomial.constant(F, 1) * variables[0] * variables[3]
        + MPolynomial.constant(F, 5) * (variables[3] ** 3)
        + MPolynomial.constant(F, 5)
    )
    point = [0, 5, 5, 2]
    e1, e2 = mpoly1.evaluate(point), mpoly2.evaluate(point)
    assert e1 * e2 % FIELD_PRIME == (mpoly1 * mpoly2).evaluate(point)
    assert (e1 + e2) % FIELD_PRIME == (mpoly1 + mpoly2).evaluate(point)


def test_evaluate_symbolic():
    # (ref: m_polynomial.rs:488-529)
    mpoly = MPolynomial(F, {(0, 1, 5): 17, (6, 2, 13): 8})
    polys = [
        Polynomial(F, [5, 0, 2]),
        Polynomial(F, [2, 6, 34]),
        Polynomial(F, [8, 9, 10]),
    ]
    want = (
        Polynomial(F, [17]) * (polys[0] ** 0) * (polys[1] ** 1) * (polys[2] ** 5)
        + Polynomial(F, [8]) * (polys[0] ** 6) * (polys[1] ** 2) * (polys[2] ** 13)
    )
    assert mpoly.evaluate_symbolic(polys) == want


def test_pow():
    mpoly = MPolynomial(F, {(1, 2, 5): 3, (5, 3, 4): 4})
    want = MPolynomial(
        F, {(11, 8, 13): 144, (3, 6, 15): 27, (7, 7, 14): 108, (15, 9, 12): 64}
    )
    assert mpoly**3 == want


def test_evaluate_codewords_matches_symbolic():
    """Device pointwise evaluation == host symbolic composition on a domain."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from zk_stark_tpu.ops import limbs as L
    from zk_stark_tpu.ops.poly_ops import mpoly_evaluate_codewords

    mpoly = MPolynomial(F, {(0, 1, 2): 17, (3, 2, 0): 8, (1, 0, 0): 1})
    polys = [
        Polynomial(F, [5, 0, 2]),
        Polynomial(F, [2, 6, 34]),
        Polynomial(F, [8, 9, 10]),
    ]
    composed = mpoly.evaluate_symbolic(polys)
    domain = list(range(1, 17))
    points = [
        L.ints_to_mont([poly.evaluate(x) for x in domain]) for poly in polys
    ]
    got = list(L.mont_to_ints(mpoly_evaluate_codewords(mpoly.dictionary, points)))
    assert got == [composed.evaluate(x) for x in domain]
