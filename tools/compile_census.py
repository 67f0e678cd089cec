#!/usr/bin/env python
"""Count distinct XLA compilations behind one prove/verify (VERDICT r1 #8).

Cold wall time = sum of per-program compiles; the fix has two levers:
fewer/larger programs (fused segments, pooled jits) and the persistent
compilation cache (enabled in bench.py + tests/conftest.py).  This census
makes the program count visible so regressions are caught.

Usage: python tools/compile_census.py [--chain N]
"""

from __future__ import annotations

import argparse
import logging
import os
import re
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_log_compiles", True)


class Census(logging.Handler):
    def __init__(self):
        super().__init__()
        self.events: list[str] = []

    def emit(self, record):
        msg = record.getMessage()
        if "Compiling" in msg or "compilation" in msg:
            m = re.search(r"Compiling (\S+)", msg)
            if m:
                self.events.append(m.group(1))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=0,
                    help="census a RescueChain prove instead of RPSSS sign")
    args = ap.parse_args()

    census = Census()
    logging.getLogger("jax").addHandler(census)
    logging.getLogger("jax._src.interpreters.pxla").addHandler(census)
    logging.getLogger("jax._src.dispatch").addHandler(census)

    from zk_stark_tpu.field import Field

    field = Field()
    t0 = time.time()
    if args.chain:
        from zk_stark_tpu.models.rescue_chain import make_chain_stark
        from zk_stark_tpu.proof_stream import ProofStream

        model, stark = make_chain_stark(field, args.chain)
        air = model.air(stark.omicron, stark.omicron_domain_length)
        y = model.run(1)
        proof = stark.prove(
            model.trace(1), air, model.boundary_constraints(y),
            ProofStream(field),
        )
        stark.verify(air, model.boundary_constraints(y),
                     ProofStream.deserialize(proof, field))
    else:
        from zk_stark_tpu.models.rpsss import RPSSS

        rpsss = RPSSS(field)
        sk, pk = rpsss.keygen()
        sig = rpsss.sign(sk, b"census")
        assert rpsss.verify(pk, b"census", sig)
    wall = time.time() - t0

    counts = Counter(census.events)
    print(f"total XLA compilations: {sum(counts.values())} "
          f"({len(counts)} distinct names), wall {wall:.1f}s")
    for name, c in counts.most_common():
        print(f"{c:5d}  {name}")


if __name__ == "__main__":
    main()
