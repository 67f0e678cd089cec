#!/usr/bin/env python
"""Build SCALING_r04.json from MEASURED kernel times (VERDICT r3 items 1/5).

Round 3's scaling projection extrapolated the 2^22 NTT time from the 2^20
measurement.  Round 4 measures the Pallas NTT at 2^20/2^21/2^22 directly on
the chip (bench.py ntt sweep); this tool takes those measured local times
and combines them with the analytic four-step all_to_all traffic to project
multi-chip efficiency — the ICI term is the ONLY analytic quantity left
(real multi-chip hardware is not reachable from this environment).

Inputs: a bench-extras JSON (from `python bench.py` stderr-extras or
TPU_PROBE/BENCH artifacts) containing ntt_2p{20,21,22}_ms.
Usage: python tools/make_scaling_r04.py --bench BENCH_r04_extras.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def project(local_ms: float, logn: int, d: int, ici_gbps: float) -> dict:
    n = 1 << logn
    elt = 32
    # four-step transpose: each device exchanges (d-1)/d of its n/d shard
    a2a_bytes = n // d * elt * (d - 1) // d
    ici_ms = a2a_bytes / (ici_gbps * 1e9) * 1000
    shard_ms = local_ms / d
    return {
        "local_ms": round(shard_ms, 3),
        "ici_ms": round(ici_ms, 3),
        "a2a_bytes_per_device": a2a_bytes,
        "efficiency": round(shard_ms / (shard_ms + ici_ms), 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", required=True,
                    help="JSON with measured ntt_2p{20,21,22}_ms")
    ap.add_argument("--ici-gbps", type=float, default=180.0)
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING_r04.json"))
    args = ap.parse_args()

    with open(args.bench) as f:
        bench = json.load(f)
    if "extra" in bench:
        bench = bench["extra"]

    measured = {}
    for logn in (20, 21, 22):
        key = f"ntt_2p{logn}_ms"
        if key in bench:
            measured[logn] = bench[key]
    assert 22 in measured, "need a MEASURED 2^22 NTT time (run bench.py)"

    result = {
        "round": 4,
        "methodology": (
            "local kernel times are MEASURED single-chip Pallas NTT wall "
            "times at 2^20/2^21/2^22 (bench.py sweep, v5e over the axon "
            "transport, RTT-corrected); multi-chip efficiency = "
            "local/D / (local/D + ici), where only the ici term is "
            f"analytic: four-step all_to_all bytes at {args.ici_gbps} "
            "GB/s/chip ICI.  No extrapolated kernel times remain "
            "(VERDICT r3 item 1)."
        ),
        "measured_local_ms": {
            f"2^{k}": v for k, v in sorted(measured.items())
        },
        "projection": {
            f"2^{logn}": {
                f"D={d}": project(ms, logn, d, args.ici_gbps)
                for d in (2, 4, 8)
            }
            for logn, ms in sorted(measured.items())
        },
    }
    eff8 = result["projection"]["2^22"]["D=8"]["efficiency"]
    result["north_star"] = (
        f">80% scaling at 2^22: {eff8 * 100:.1f}% at D=8 from the MEASURED "
        f"2^22 local time {measured[22]} ms"
    )
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["projection"]["2^22"]))
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
