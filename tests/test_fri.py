"""FRI tests (ref: fri.rs:419-531)."""

from zk_stark_tpu.field import Field, FIELD_PRIME as P
from zk_stark_tpu.fri import FRI
from zk_stark_tpu.ops import limbs as L
from zk_stark_tpu.poly import Polynomial
from zk_stark_tpu.proof_stream import ProofStream

F = Field()


def test_sample_indices_golden():
    fri = FRI(F, F.generator().value, F.primitive_nth_root(256).value, 256, 4, 17)
    sample = fri.sample_indices(
        bytes.fromhex(
            "d4b6e8af1114859c1c24b6496a3aef2f55a21105bc103af7e12dc3b2c101fe66"
        ),
        128,
        128,
        17,
    )
    assert sample == [40, 121, 5, 113, 97, 68, 126, 88, 26, 82, 81, 91, 93, 125, 10, 57, 48]


def test_prove_verify_and_reject():
    degree, expansion, tests = 63, 4, 17
    n = (degree + 1) * expansion
    omega = F.primitive_nth_root(n).value
    fri = FRI(F, F.generator().value, omega, n, expansion, tests)

    poly = Polynomial(F, list(range(degree + 1)))
    codeword = [poly.evaluate(pow(omega, i, P)) for i in range(n)]

    ps = ProofStream(F)
    fri.prove(L.ints_to_mont(codeword), ps)
    points = []
    fri.verify(ps, points)
    assert points
    for x, y in points:
        assert poly.evaluate(pow(omega, x, P)) == y

    # corrupt the codeword -> rejection (ref: fri.rs:512-528)
    bad = list(codeword)
    for i in range(degree // 3):
        bad[i] = 0
    ps = ProofStream(F)
    fri.prove(L.ints_to_mont(bad), ps)
    try:
        fri.verify(ps, [])
        raise AssertionError("corrupt codeword accepted")
    except ValueError:
        pass


def test_num_rounds():
    fri = FRI(F, F.generator().value, F.primitive_nth_root(4096).value, 4096, 4, 64)
    # halve while length > expansion and length > 4*tests: 4096 -> 512
    assert fri.num_rounds() == 4
