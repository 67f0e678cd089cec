#!/usr/bin/env python
"""Re-run the 2^21/2^22 NTT sweep (after the stage-range VMEM fix) and
merge the measurements into BENCH_r04_preview.json."""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import bench  # noqa: E402


def main() -> None:
    bench.log(f"devices: {jax.devices()}")
    bench._RTT_MS = bench._measure_rtt()
    bench.log(f"rtt {bench._RTT_MS:.1f} ms")
    bench._BW.update(bench.bench_hbm_bw())
    bench.log(f"bw {bench._BW}")
    cal = bench.bench_montmul_micro()
    bench.log(f"cal {cal}")
    sweep = bench.bench_ntt_sweep()
    bench.log(f"sweep {sweep}")

    path = os.path.join(REPO, "BENCH_r04_preview.json")
    with open(path) as f:
        data = json.load(f)
    data["extra"].update(sweep)
    data["extra"]["ntt_sweep_rtt_ms"] = round(bench._RTT_MS, 1)
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    with open(os.path.join(REPO, ".bench_extras.json"), "w") as f:
        json.dump(data["extra"], f)
    print(json.dumps(sweep))


if __name__ == "__main__":
    main()
