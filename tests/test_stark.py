"""End-to-end STARK tests at the reference test configuration
(ref: stark.rs:810-881): expansion 4, 2 collinearity checks, security 2,
Rescue-Prime m=2 N=27 -> omicron domain 128, FRI domain 512."""

import random

import pytest

from zk_stark_tpu.field import Field
from zk_stark_tpu.models.rescue_prime import RescuePrime
from zk_stark_tpu.proof_stream import ProofStream
from zk_stark_tpu.stark import Stark, VerificationError

F = Field()


@pytest.fixture(scope="module")
def setup():
    rp = RescuePrime(F, 2, 1, 2, 27)
    stark = Stark(F, 4, 2, 2, rp.m, rp.N + 1, 2)
    air = rp.transition_constraints(stark.omicron, stark.omicron_domain_length)
    return rp, stark, air


def test_domain_sizing(setup):
    _, stark, _ = setup
    assert stark.omicron_domain_length == 128
    assert stark.fri.domain_length == 512
    assert stark.num_randomizers == 8


def test_prove_verify_and_false_boundary(setup):
    rp, stark, air = setup
    output = F.sample(b"\xde\xad\xbe\xef").value
    for trial in range(2):
        inp = output
        output = rp.hash(inp)
        trace = rp.trace(inp)
        boundary = rp.boundary_constraints(output)

        proof = stark.prove(trace, air, boundary, ProofStream(F))
        stark.verify(air, boundary, ProofStream.deserialize(proof, F))

        # false claim: output + 1 must be rejected (ref: stark.rs:853-859)
        bad = rp.boundary_constraints((output + 1) % F.order)
        with pytest.raises(VerificationError):
            stark.verify(air, bad, ProofStream.deserialize(proof, F))


def test_false_witness_rejected(setup):
    """A perturbed trace yields a proof that the VERIFIER rejects.

    SETTLED divergence from the reference test (stark.rs:864-880), which
    asserts prove() itself fails via the quotient degree check: with the
    reference's own degree bookkeeping (quotient truncated to
    lhs_deg - rhs_deg + 1 coefficients, stark.rs:451-464 +
    ntt_arithmetics.rs:296-307), the truncated quotient of a perturbed
    trace generically has degree exactly equal to the bound, so the check
    passes and prove succeeds.  This was verified empirically against an
    exact host-side reproduction of the reference algorithms
    (tools/degree_check_experiment.py; write-up in PARITY_NOTES.md): the
    reference's own assertion is unsatisfiable in exact arithmetic.  We pin
    the actual behavior deterministically: prove succeeds (degree check
    passes, same as the reference's code would) and verify rejects via the
    combination check (stark.rs:756-765).
    """
    rp, stark, air = setup
    random.seed(3)
    inp = F.sample(b"\x01\x02").value
    output = rp.hash(inp)
    trace = rp.trace(inp)
    boundary = rp.boundary_constraints(output)

    cycle = random.randrange(len(trace))
    register = random.randrange(rp.m)
    err = F.sample(random.randbytes(17)).value
    trace[cycle][register] = (trace[cycle][register] + err) % F.order

    # generic perturbation: the degree check passes, exactly as the
    # reference's truncated-quotient bookkeeping dictates
    proof = stark.prove(trace, air, boundary, ProofStream(F))
    with pytest.raises(VerificationError):
        stark.verify(air, boundary, ProofStream.deserialize(proof, F))


def test_proof_tamper_rejected(setup):
    rp, stark, air = setup
    inp = F.sample(b"\x07").value
    output = rp.hash(inp)
    boundary = rp.boundary_constraints(output)
    proof = stark.prove(rp.trace(inp), air, boundary, ProofStream(F))

    # flip one byte in the middle of the proof
    tampered = bytearray(proof)
    tampered[len(tampered) // 2] ^= 0x01
    with pytest.raises((VerificationError, ValueError, AssertionError)):
        stark.verify(
            air, boundary, ProofStream.deserialize(bytes(tampered), F)
        )


def test_verify_zerofier_uses_configured_trace_length(setup):
    """ADVICE r4 (medium): the fused verify segment must build the
    transition zerofier from the CONFIGURED original_trace_length — the
    reference verifier calls self.transition_zerofier() (stark.rs:728),
    which spans omicron^0..^(self.original_trace_length-2)
    (stark.rs:188-196) — not from the boundary-derived length
    (stark.rs:572, which only feeds randomized_trace_length / boundary
    quotient degree bounds).  The divergence has no end-to-end witness
    (a boundary omitting the final cycle already desynchronizes the
    boundary-quotient shift bookkeeping in both implementations), so pin
    the seg cache key: after a verify, every verify_seg entry must carry
    orig_t == stark.original_trace_length.
    """
    rp, stark, air = setup
    inp = F.sample(b"\x42").value
    output = rp.hash(inp)
    trace = rp.trace(inp)
    boundary = rp.boundary_constraints(output)
    proof = stark.prove(trace, air, boundary, ProofStream(F))
    stark.verify(air, boundary, ProofStream.deserialize(proof, F))

    keys = [
        k
        for k in Stark._SEG_CACHE
        if k[0] == "verify_seg" and k[1] == stark._config_key()
    ]
    assert keys, "verify() did not populate the verify_seg cache"
    for k in keys:
        # key layout: ("verify_seg", config_key, K, W, orig_t, ...)
        _, _cfg, _K, _W, orig_t = k[:5]
        assert orig_t == stark.original_trace_length
