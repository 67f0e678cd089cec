"""Generate the deterministic proof/signature fixture under tests/fixtures/.

Uses a counter-based SHAKE-256 rng so the signature bytes are reproducible;
tests/test_fixture.py re-signs with the same rng and asserts byte equality,
then cross-parses the blob with an independent wire-format decoder.

Small configuration (expansion 4, 2 checks, security 2) — same scale as the
reference's own stark test (ref: /root/reference/src/stark/stark.rs:810-881)
so it runs in seconds on the CPU backend.
"""

import hashlib
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from zk_stark_tpu.field import Field
from zk_stark_tpu.models.rpsss import RPSSS


class DetRng:
    """Deterministic byte stream: shake256("zk-stark-fixture" || counter)."""

    def __init__(self, tag: bytes = b"zk-stark-fixture"):
        self.tag = tag
        self.counter = 0

    def __call__(self, n: int) -> bytes:
        out = hashlib.shake_256(
            self.tag + self.counter.to_bytes(8, "big")
        ).digest(n)
        self.counter += 1
        return out


def make(outdir: pathlib.Path) -> dict:
    field = Field()
    rpsss = RPSSS(
        field,
        expansion_factor=4,
        num_collinearity_checks=2,
        security_level=2,
        transition_constraints_degree=2,
        rng=DetRng(),
    )
    sk, pk = rpsss.keygen()
    doc = b"attack at dawn"
    sig = rpsss.sign(sk, doc)
    assert rpsss.verify(pk, doc, sig)
    assert not rpsss.verify(pk, b"attack at dusk", sig)

    outdir.mkdir(parents=True, exist_ok=True)
    (outdir / "signature.bin").write_bytes(sig)
    meta = {
        "sk": str(sk),
        "pk": str(pk),
        "document": doc.decode(),
        "signature_sha256": hashlib.sha256(sig).hexdigest(),
        "signature_bytes": len(sig),
        "config": {
            "expansion_factor": 4,
            "num_collinearity_checks": 2,
            "security_level": 2,
            "transition_constraints_degree": 2,
        },
    }
    (outdir / "meta.json").write_text(json.dumps(meta, indent=2) + "\n")
    return meta


if __name__ == "__main__":
    here = pathlib.Path(__file__).resolve().parent.parent
    meta = make(here / "tests" / "fixtures")
    print(json.dumps(meta, indent=2))
