#!/usr/bin/env python
"""Round-5 kernel validation + timing on the real TPU, one session:

1. bundled-stage Pallas NTT at 2^20: bit-exact vs ops.ntt.ntt_mont + timing
2. NTT sweep 2^21 (long-column recursion still correct with bundles)
3. Rescue batched permutation (unrolled S-box chain): parity vs host + timing
4. Merkle device tree at 2^18: root parity + amortized builder timing
"""
from __future__ import annotations

import json
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


_S = jax.jit(lambda a: a.reshape(-1)[:4])


def dsync(x):
    np.asarray(_S(x))


def measure_rtt():
    x = jnp.zeros((128,), jnp.uint32)
    dsync(x)
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        dsync(x)
        best = min(best, time.time() - t0)
    return best


def timeit(fn, reps, rtt):
    y = fn()
    dsync(y)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            y = fn()
        dsync(y)
        best = min(best, (time.time() - t0 - rtt) / reps)
    return best * 1000


def main():
    from zk_stark_tpu.field import Field, FIELD_PRIME as P
    from zk_stark_tpu.ops import limbs as L
    from zk_stark_tpu.ops.ntt import ntt_mont, scalar_mul_mont
    from zk_stark_tpu.ops.ntt_pallas import ntt_mont_pallas

    out = {}
    rtt = measure_rtt()
    out["rtt_ms"] = round(rtt * 1000, 1)
    log(f"rtt {out['rtt_ms']} ms")
    field = Field()
    random.seed(0)

    # 1. NTT 2^20
    n = 1 << 20
    root = field.primitive_nth_root(n).value
    x = jnp.asarray(np.tile(
        np.asarray(L.ints_to_mont([random.randrange(P) for _ in range(4096)])),
        (n // 4096, 1),
    ))
    t0 = time.time()
    y = ntt_mont_pallas(x, root)
    ref = ntt_mont(x, root)
    same = bool(jnp.all(y == ref))
    log(f"ntt 2^20 parity {'OK' if same else 'MISMATCH'} "
        f"(cold {time.time()-t0:.0f}s)")
    assert same, "bundled NTT diverged from jnp four-step"
    out["ntt_2p20_ms"] = round(timeit(lambda: ntt_mont_pallas(x, root), 10, rtt), 3)
    log(f"ntt 2^20: {out['ntt_2p20_ms']} ms")

    # 2. NTT 2^21 roundtrip (long-column recursion)
    n2 = 1 << 21
    root2 = field.primitive_nth_root(n2).value
    x2 = jnp.asarray(np.tile(np.asarray(x), (2, 1)))
    y2 = ntt_mont_pallas(x2, root2)
    back = scalar_mul_mont(
        ntt_mont_pallas(y2, pow(root2, -1, P)), pow(n2, -1, P)
    )
    assert bool(jnp.all(back == x2)), "2^21 roundtrip mismatch"
    out["ntt_2p21_ms"] = round(
        timeit(lambda: ntt_mont_pallas(x2, root2), 8, rtt), 3
    )
    log(f"ntt 2^21: {out['ntt_2p21_ms']} ms (roundtrip ok)")

    # 3. Rescue batch (unrolled inverse-S-box)
    from zk_stark_tpu.models.rescue_prime import RescuePrime

    rp = RescuePrime(field)
    b = 1 << 14
    inputs = L.ints_to_mont(list(range(b)))
    t0 = time.time()
    h = rp.hash_batch_device(inputs)
    dsync(h)
    log(f"rescue cold {time.time()-t0:.0f}s")
    got = [int(v) for v in L.mont_to_ints(h[:4])]
    want = [rp.hash(v) for v in range(4)]
    assert got == want, f"rescue device/host mismatch: {got} vs {want}"
    out["rescue_2p14_ms"] = round(
        timeit(lambda: rp.hash_batch_device(inputs), 5, rtt), 3
    )
    log(f"rescue 2^14: {out['rescue_2p14_ms']} ms (parity ok)")

    # 4. Merkle 2^18
    from zk_stark_tpu import merkle

    nm = 1 << 18
    base = L.ints_to_limbs([random.randrange(P) for _ in range(4096)])
    limbs_np = np.tile(base, (nm // 4096, 1))
    canon = jnp.asarray(limbs_np)
    host = merkle.tree_for_codeword(limbs_np, device=False)
    dev = merkle.tree_for_codeword(canon, device=True)
    assert dev.root == host.root, "merkle root mismatch"
    builder = merkle._tree_builder(nm, 256)
    out["merkle_2p18_work_ms"] = round(
        timeit(lambda: builder(canon)[-1], 10, rtt), 3
    )
    log(f"merkle 2^18 work: {out['merkle_2p18_work_ms']} ms (root ok)")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
