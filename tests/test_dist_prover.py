"""Distributed prover integration: the REAL Stark.prove runs sharded over
the 8-device CPU mesh and produces a proof byte-identical to the
single-device proof under the same rng (VERDICT r1 item 1; SURVEY §7 step 9).

All device arithmetic is exact uint32 limb math, so sharding the pipeline
(four-step NTTs with an all_to_all exchange, shard-local batch inversion,
block-sharded folds and AIR evaluation) must not change a single byte of
the transcript."""

import hashlib

import pytest

from zk_stark_tpu.field import Field
from zk_stark_tpu.models.rescue_prime import RescuePrime
from zk_stark_tpu.parallel.engine import dist_engine
from zk_stark_tpu.proof_stream import ProofStream
from zk_stark_tpu.stark import Stark

F = Field()


class DetRng:
    def __init__(self, tag: bytes = b"dist-parity"):
        self.tag = tag
        self.counter = 0

    def __call__(self, n: int) -> bytes:
        out = hashlib.shake_256(
            self.tag + self.counter.to_bytes(8, "big")
        ).digest(n)
        self.counter += 1
        return out


@pytest.fixture(scope="module")
def problem():
    rp = RescuePrime(F, 2, 1, 2, 27)
    inp = F.sample(b"\x42\x17").value
    output = rp.hash(inp)
    trace = rp.trace(inp)
    boundary = rp.boundary_constraints(output)
    return rp, trace, boundary


def _make_stark(engine=None):
    return Stark(F, 4, 2, 2, 2, 28, 2, rng=DetRng(), engine=engine)


def test_dist_prove_byte_identical(problem):
    rp, trace, boundary = problem
    single = _make_stark()
    air = rp.transition_constraints(
        single.omicron, single.omicron_domain_length
    )
    proof_single = single.prove(trace, air, boundary, ProofStream(F))

    import jax

    n_dev = len(jax.devices())
    assert n_dev == 8, "suite must run on the virtual 8-device CPU mesh"
    dist = _make_stark(engine=dist_engine(n_dev))
    proof_dist = dist.prove(trace, air, boundary, ProofStream(F))

    assert proof_dist == proof_single, (
        "sharded prover diverged from single-device proof bytes"
    )
    # and the proof verifies with the plain verifier
    single.verify(air, boundary, ProofStream.deserialize(proof_dist, F))


def test_dist_engine_ntt_matches_single():
    import random

    import jax.numpy as jnp

    from zk_stark_tpu.ops import limbs as L
    from zk_stark_tpu.ops.ntt import intt_mont, ntt_mont

    random.seed(7)
    eng = dist_engine(8)
    for n in (64, 512):
        root = F.primitive_nth_root(n).value
        x = L.ints_to_mont([random.randrange(L.P) for _ in range(n)])
        assert bool(jnp.all(eng.ntt(x, root) == ntt_mont(x, root)))
        assert bool(
            jnp.all(eng.intt(x, root) == intt_mont(x, root))
        )
        assert bool(jnp.all(eng.batch_inv(x) == L.batch_inv_jit(x)))
