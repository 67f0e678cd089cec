"""Iterated Rescue-permutation chain model (long-trace AIR protocol)."""

import pytest

from zk_stark_tpu.field import Field
from zk_stark_tpu.models.rescue_chain import RescueChain, make_chain_stark
from zk_stark_tpu.models.rescue_prime import RescuePrime
from zk_stark_tpu.proof_stream import ProofStream
from zk_stark_tpu.stark import ProvingError, VerificationError

F = Field()


def test_chain_length_one_equals_hash():
    rp = RescuePrime(F)
    ch = RescueChain(F, 1)
    assert ch.run(1) == rp.hash(1)
    assert ch.run(12345) == rp.hash(12345)


def test_trace_shape():
    ch = RescueChain(F, 3)
    tr = ch.trace(7)
    assert len(tr) == ch.num_cycles == 3 * 27 + 1
    assert tr[0] == [7, 0]
    assert tr[-1][0] == ch.run(7)


@pytest.fixture(scope="module")
def chain_setup():
    model, stark = make_chain_stark(
        F, 2, expansion_factor=4, num_collinearity_checks=2, security_level=2
    )
    air = model.air(stark.omicron, stark.omicron_domain_length)
    return model, stark, air


def test_chain_prove_verify(chain_setup):
    model, stark, air = chain_setup
    x = 123456789
    y = model.run(x)
    trace = model.trace(x)
    boundary = model.boundary_constraints(y)

    proof = stark.prove(trace, air, boundary, ProofStream(F))
    stark.verify(air, boundary, ProofStream.deserialize(proof, F))

    # wrong output rejected
    bad = model.boundary_constraints((y + 1) % F.order)
    with pytest.raises(VerificationError):
        stark.verify(air, bad, ProofStream.deserialize(proof, F))


def test_chain_false_witness_rejected(chain_setup):
    model, stark, air = chain_setup
    x = 42
    y = model.run(x)
    trace = model.trace(x)
    trace[30][1] = (trace[30][1] + 5) % F.order
    boundary = model.boundary_constraints(y)
    # the prover's degree sanity check must reject the tampered trace with
    # ProvingError specifically (ref: stark.rs:451-464); if it ever starts
    # emitting a proof instead, that proof must fail verification — any
    # other exception (shape error, crash) fails this test
    try:
        proof = stark.prove(trace, air, boundary, ProofStream(F))
    except ProvingError:
        return
    with pytest.raises(VerificationError):
        stark.verify(air, boundary, ProofStream.deserialize(proof, F))
