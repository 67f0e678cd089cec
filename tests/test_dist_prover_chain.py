"""Chain-scale sharded prover byte-identity (FRI domain 2^18).

The default-suite version of this check runs at a 512-point FRI domain
(tests/test_dist_prover.py); this one proves a RescueChain statement whose
FRI domain is 2^18 — the scale where the four-step NTT actually tiles over
all 8 virtual devices — and asserts the sharded proof is byte-identical to
the single-device proof.  Runtime is tens of minutes on the 2-core CPU
mesh, so it is opt-in:

    ZK_STARK_TPU_CHAIN_DIST=1 python -m pytest tests/test_dist_prover_chain.py

The same check (plus timings) is produced as a committed artifact by
``python tools/scaling_harness.py --chain 512 --byte-identity``
(SCALING_r03.json).
"""

import hashlib
import os

import pytest

from zk_stark_tpu.field import Field


@pytest.mark.skipif(
    not os.environ.get("ZK_STARK_TPU_CHAIN_DIST"),
    reason="long-running chain-scale distributed prove; "
    "set ZK_STARK_TPU_CHAIN_DIST=1",
)
def test_chain512_sharded_proof_byte_identical():
    from zk_stark_tpu.models.rescue_chain import make_chain_stark
    from zk_stark_tpu.parallel.engine import dist_engine
    from zk_stark_tpu.proof_stream import ProofStream

    field = Field()

    def det_rng():
        counter = [0]

        def f(k: int) -> bytes:
            counter[0] += 1
            return hashlib.blake2b(
                b"chain-dist-test" + counter[0].to_bytes(8, "big")
            ).digest()[:k]

        return f

    proofs = []
    for engine in (None, dist_engine(8)):
        model, stark = make_chain_stark(field, 512)
        assert stark.fri.domain_length == 1 << 18
        if engine is not None:
            stark.engine = engine
            stark.fri.engine = engine
        stark._rng = det_rng()
        air = model.air(stark.omicron, stark.omicron_domain_length)
        x = 24681357
        y = model.run(x)
        proof = stark.prove(
            model.trace(x), air, model.boundary_constraints(y),
            ProofStream(field),
        )
        stark.verify(
            air, model.boundary_constraints(y),
            ProofStream.deserialize(proof, field),
        )
        proofs.append(proof)
    assert proofs[0] == proofs[1]
