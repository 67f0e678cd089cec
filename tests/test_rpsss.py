"""RPSSS signature scheme end-to-end (ref: rpsss.rs:100-135).

The default suite runs a reduced-security configuration for speed; the full
reference configuration (expansion 4, 64 checks, security 128) runs in
bench.py / under ZK_STARK_TPU_FULL=1.
"""

import os

import pytest

from zk_stark_tpu.field import Field
from zk_stark_tpu.models.rpsss import RPSSS

F = Field()


@pytest.fixture(scope="module")
def rpsss_small():
    # security 2 -> 2 collinearity checks; same code paths, smaller domains
    return RPSSS(
        F,
        expansion_factor=4,
        num_collinearity_checks=2,
        security_level=2,
        transition_constraints_degree=3,
    )


def test_keygen_sign_verify(rpsss_small):
    rpsss = rpsss_small
    sk, pk = rpsss.keygen()
    assert pk == rpsss.rp.hash(sk)

    doc = b"Hello, World!"
    signature = rpsss.sign(sk, doc)
    assert rpsss.verify(pk, doc, signature)

    # wrong document must fail (ref: rpsss.rs:127-132)
    assert not rpsss.verify(pk, b"Malicious document", signature)
    # wrong public key must fail
    assert not rpsss.verify((pk + 1) % F.order, doc, signature)
    # garbage signature must fail, not crash
    assert not rpsss.verify(pk, doc, b"\x00" * 40)


@pytest.mark.skipif(
    not os.environ.get("ZK_STARK_TPU_FULL"),
    reason="full 128-bit security run is slow; set ZK_STARK_TPU_FULL=1",
)
def test_full_security_configuration():
    rpsss = RPSSS(F)  # expansion 4, checks 64, security 128, tc_degree 3
    sk, pk = rpsss.keygen()
    doc = b"Hello, World!"
    signature = rpsss.sign(sk, doc)
    assert rpsss.verify(pk, doc, signature)
    assert not rpsss.verify(pk, b"Malicious document", signature)
