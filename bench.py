#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: RPSSS sign wall time at the reference configuration
(expansion 4, 64 collinearity checks, security 128, tc degree 3 —
omicron domain 2^10, FRI domain 2^12), the one configuration with a
published reference number: 18,913 ms (NTT fast path, release build,
ref: /root/reference/src/rpsss.rs:97).  vs_baseline = baseline / ours
(speedup; higher is better).

Extras: NTT butterflies/s/chip at 2^20 (north-star kernel metric),
verify time, batched Rescue-Prime hash throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_ntt_2p20() -> dict:
    import random

    import jax.numpy as jnp

    from zk_stark_tpu.field import Field, FIELD_PRIME as P
    from zk_stark_tpu.ops import limbs as L
    from zk_stark_tpu.ops.ntt import ntt_mont

    field = Field()
    random.seed(0)
    logn = 20
    n = 1 << logn
    root = field.primitive_nth_root(n).value
    x = jnp.tile(
        L.ints_to_mont([random.randrange(P) for _ in range(4096)]),
        (n // 4096, 1),
    )

    # prefer the fused-stage Pallas path (TPU); fall back to the jnp
    # four-step kernel if it is unavailable on this backend
    transform = ntt_mont
    which = "jnp"
    try:
        from zk_stark_tpu.ops.ntt_pallas import ntt_mont_pallas

        y = ntt_mont_pallas(x, root)
        ref = ntt_mont(x, root)
        # full-array equality: a silent twiddle regression anywhere in the
        # [r, c] plane must fail loudly, not read as "unavailable"
        if not bool(jnp.all(y == ref)):
            raise SystemExit("pallas NTT output mismatch vs jnp four-step")
        transform = ntt_mont_pallas
        which = "pallas"
    except SystemExit:
        raise
    except Exception as e:
        log(f"pallas NTT unavailable ({e!r}); using jnp four-step")
        y = ntt_mont(x, root)

    y.block_until_ready()  # compile
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        y = transform(y, root)
    y.block_until_ready()
    dt = (time.time() - t0) / reps
    butterflies = (n // 2) * logn
    return {
        "ntt_2p20_ms": round(dt * 1000, 3),
        "ntt_2p20_butterflies_per_s": round(butterflies / dt),
        "ntt_2p20_kernel": which,
    }


def bench_rescue_batch() -> dict:
    from zk_stark_tpu.field import Field
    from zk_stark_tpu.models.rescue_prime import RescuePrime
    from zk_stark_tpu.ops import limbs as L

    field = Field()
    rp = RescuePrime(field)
    b = 1 << 14
    inputs = L.ints_to_mont(list(range(b)))
    out = rp.hash_batch_device(inputs)
    out.block_until_ready()  # compile
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        out = rp.hash_batch_device(inputs)
    out.block_until_ready()
    dt = (time.time() - t0) / reps
    return {
        "rescue_hash_2p14_ms": round(dt * 1000, 3),
        "rescue_hashes_per_s": round(b / dt),
    }


def bench_rpsss() -> dict:
    from zk_stark_tpu.field import Field
    from zk_stark_tpu.models.rpsss import RPSSS

    field = Field()
    rpsss = RPSSS(field)  # reference defaults: 4 / 64 / 128 / 3
    t0 = time.time()
    sk, pk = rpsss.keygen()
    keygen_ms = (time.time() - t0) * 1000
    doc = b"Hello, World!"

    log("warmup sign (compiles)...")
    t0 = time.time()
    sig = rpsss.sign(sk, doc)
    warm_ms = (time.time() - t0) * 1000
    log(f"warmup sign: {warm_ms:.0f} ms, proof {len(sig)} bytes")

    t0 = time.time()
    sig = rpsss.sign(sk, doc)
    sign_ms = (time.time() - t0) * 1000

    log("warmup verify (compiles)...")
    t0 = time.time()
    ok = rpsss.verify(pk, doc, sig)
    verify_cold_ms = (time.time() - t0) * 1000
    assert ok, "benchmark signature failed to verify"
    log(f"warmup verify: {verify_cold_ms:.0f} ms")

    t0 = time.time()
    ok = rpsss.verify(pk, doc, sig)
    verify_ms = (time.time() - t0) * 1000
    assert ok
    assert not rpsss.verify(pk, b"other doc", sig)

    return {
        "keygen_ms": round(keygen_ms, 1),
        "sign_ms": round(sign_ms, 1),
        "sign_cold_ms": round(warm_ms, 1),
        "verify_ms": round(verify_ms, 1),
        "verify_cold_ms": round(verify_cold_ms, 1),
        "proof_bytes": len(sig),
    }


def bench_chain() -> dict:
    """Long-trace proof (iterated Rescue permutation chain).

    Default: chain 512 -> omicron domain 2^16, FRI domain 2^18.
    BENCH_CHAIN_FULL=1: chain 3200 -> omicron 2^18, FRI 2^20 (config 5
    scale on a single chip).
    """
    from zk_stark_tpu.field import Field
    from zk_stark_tpu.models.rescue_chain import make_chain_stark
    from zk_stark_tpu.proof_stream import ProofStream

    field = Field()
    chain_len = 3200 if os.environ.get("BENCH_CHAIN_FULL") else 512
    model, stark = make_chain_stark(field, chain_len)
    air = model.air(stark.omicron, stark.omicron_domain_length)
    x = 987654321
    y = model.run(x)
    trace = model.trace(x)
    boundary = model.boundary_constraints(y)

    log(f"chain {chain_len} warmup prove (fri={stark.fri.domain_length})...")
    t0 = time.time()
    proof = stark.prove(trace, air, boundary, ProofStream(field))
    cold_ms = (time.time() - t0) * 1000
    log(f"chain warmup prove: {cold_ms:.0f} ms")
    t0 = time.time()
    proof = stark.prove(trace, air, boundary, ProofStream(field))
    prove_ms = (time.time() - t0) * 1000
    stark.verify(air, boundary, ProofStream.deserialize(proof, field))
    key = f"chain{chain_len}_fri_2p{stark.fri.domain_length.bit_length() - 1}"
    return {
        f"{key}_prove_ms": round(prove_ms, 1),
        f"{key}_prove_cold_ms": round(cold_ms, 1),
        f"{key}_proof_bytes": len(proof),
    }


def main() -> None:
    log(f"devices: {jax.devices()}")
    extras = {}
    extras.update(bench_ntt_2p20())
    log(f"ntt: {extras}")
    extras.update(bench_rescue_batch())
    log(f"rescue: {extras}")
    if not os.environ.get("BENCH_SKIP_CHAIN"):
        try:
            extras.update(bench_chain())
            log(f"chain: {extras}")
        except Exception as e:  # chain bench is best-effort
            log(f"chain bench failed: {e!r}")
    rp = bench_rpsss()
    extras.update(rp)
    log(f"rpsss: {rp}")

    baseline_sign_ms = 18913.0  # ref: rpsss.rs:97 (NTT fast path)
    value = rp["sign_ms"]
    print(
        json.dumps(
            {
                "metric": "rpsss_sign_ms",
                "value": value,
                "unit": "ms",
                "vs_baseline": round(baseline_sign_ms / value, 2),
                "extra": extras,
            }
        )
    )


if __name__ == "__main__":
    main()
