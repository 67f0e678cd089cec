#!/bin/bash
# Round-4 TPU measurement session: run with an IDLE host (host-side stage
# timings pollute under CPU contention).  Serialized single-TPU usage.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

# 1. full default bench: calibrations, NTT sweep incl 2^21/2^22,
#    chain-512 with prove+verify stage breakdowns, RPSSS
timeout 7200 python bench.py > /root/repo/BENCH_r04_preview.json \
    2> /root/repo/.bench_r04_preview.log
echo "bench rc=$?"

# 2. flagship scale: chain 3200 -> FRI 2^20 (BASELINE config 5)
BENCH_ONLY_CHAIN=1 BENCH_CHAIN_FULL=1 timeout 10800 python bench.py \
    > /root/repo/CHAIN_FULL_r04.json 2> /root/repo/.bench_chain_full.log
echo "chain full rc=$?"

# 3. cold-start / AOT probe (two fresh processes)
timeout 3600 python tools/aot_probe.py > /root/repo/.aot_probe.log 2>&1
echo "aot probe rc=$?"

# 4. measured-only scaling projection from the bench extras
python - <<'EOF'
import json
d = json.load(open('/root/repo/BENCH_r04_preview.json'))
json.dump(d.get('extra', d), open('/root/repo/.bench_extras.json', 'w'))
EOF
python tools/make_scaling_r04.py --bench /root/repo/.bench_extras.json
echo "scaling rc=$?"
echo SESSION DONE
