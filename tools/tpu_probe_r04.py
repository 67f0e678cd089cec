#!/usr/bin/env python
"""Round-4 TPU probe: validate the retiled BLAKE2b kernel + calibration.

Quick hardware session (minutes, not the full bench): measures
1. dispatch RTT + HBM bandwidth,
2. the bare mont_mul chain (roofline calibration),
3. the bare BLAKE2b compression chain (retiled kernel) —
   the round-3 1-D-layout kernel measured ~7 ns/compression equivalent,
4. the 2^18 device Merkle tree vs the host C++ path (root must match),
5. the batched Rescue hash at 2^14.

Writes TPU_PROBE_r04.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import bench  # noqa: E402  (repo-root bench.py: reuse its machinery)


def main() -> None:
    bench.log(f"devices: {jax.devices()}")
    out = {}
    bench._RTT_MS = bench._measure_rtt()
    out["dispatch_rtt_ms"] = round(bench._RTT_MS, 1)
    bench.log(f"rtt {out['dispatch_rtt_ms']} ms")
    bench._BW.update(bench.bench_hbm_bw())
    out.update(bench._BW)
    bench.log(f"hbm {out}")

    t0 = time.time()
    out.update(bench.bench_montmul_micro())
    bench.log(f"montmul ({time.time()-t0:.0f}s): {out}")

    t0 = time.time()
    out.update(bench.bench_blake2b_micro())
    bench.log(f"blake2b ({time.time()-t0:.0f}s): {out}")

    t0 = time.time()
    out.update(bench.bench_merkle_2p18())
    bench.log(f"merkle ({time.time()-t0:.0f}s): {out}")

    t0 = time.time()
    out.update(bench.bench_rescue_batch())
    bench.log(f"rescue ({time.time()-t0:.0f}s): {out}")

    with open(os.path.join(REPO, "TPU_PROBE_r04.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
