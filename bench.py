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

# The env var alone does not activate the persistent cache in this image
# (verified empirically: no cache dir was ever created in round 1); the
# config.update path works and cuts the cold 2^20 pallas compile from 542 s
# to 148 s in a fresh process.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ["JAX_COMPILATION_CACHE_DIR"],
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


_SYNC_JIT = None
#: measured dispatch+fetch round-trip latency, filled by main()
_RTT_MS = 0.0


def dsync(x) -> None:
    """Force device completion.

    ``block_until_ready`` returns EARLY on the axon remote transport
    (measured: 5 dispatched 2^18 hash kernels 'ready' in 0.2 ms, the
    following host fetch then blocked 74 s), so the only reliable sync is a
    tiny host fetch.  Costs one ~28 ms round trip — callers amortize over
    reps and subtract ``_RTT_MS``.
    """
    global _SYNC_JIT
    import numpy as np

    if _SYNC_JIT is None:
        _SYNC_JIT = jax.jit(lambda a: a.reshape(-1)[:4])
    np.asarray(_SYNC_JIT(x))


def _measure_rtt() -> float:
    import jax.numpy as jnp

    x = jnp.zeros((128,), jnp.uint32)
    dsync(x)
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        dsync(x)
        best = min(best, time.time() - t0)
    return best * 1000


def bench_hbm_bw() -> dict:
    """Measured HBM bandwidth via a while-loop streaming kernel.

    A single elementwise dispatch is too fast to time reliably over the
    axon transport (round-1 measured an impossible 10.5 TB/s on v5e), so
    the kernel runs K loop iterations inside one program: the loop carry
    must materialize to HBM every iteration (512 MiB cannot live in VMEM),
    forcing K*(read+write) traffic under one wall-clock measurement.
    """
    import jax.numpy as jnp

    n = 1 << 27  # 512 MiB of uint32
    iters = 16

    def body(i, a):
        return a ^ (i.astype(jnp.uint32) | jnp.uint32(1))

    f = jax.jit(lambda a: jax.lax.fori_loop(0, iters, body, a))
    y = jnp.zeros((n,), dtype=jnp.uint32)
    y = f(y)
    dsync(y)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        y = f(y)
        dsync(y)
        best = min(best, time.time() - t0 - _RTT_MS / 1000)
    gbps = iters * 2 * 4 * n / best / 1e9  # read + write per iteration
    return {"hbm_bw_gbps": round(gbps, 1)}


#: element size: 8 uint32 limbs
_ELT = 32

#: measured microbenchmark calibration, filled by main() before the kernel
#: benches: montmul_elt_ns (one full Montgomery multiply per element, from a
#: dependent-chain kernel) and blake2b_compression_ns (one single-block
#: BLAKE2b-512 compression, from the bare Pallas kernel).  A standalone REDC
#: (from_mont canonicalization) is modeled at half a multiply — it is the
#: reduction half of the product-scanning mul.
_CAL: dict = {}


def _roofline(name: str, measured_ms: float, bytes_moved: int, bw_gbps: float,
              mont_muls: float = 0, compressions: int = 0) -> dict:
    """Measured-ceiling roofline => % of speed-of-light.

    Memory ceiling: bytes-moved model over the *measured* HBM streaming
    bandwidth.  Compute ceiling: operation counts priced at the *measured*
    microbenchmark rates in ``_CAL`` (VERDICT r3: the former hand-estimated
    500-lane-op constant reported a kernel at 235% SoL; every number here is
    now anchored to a measurement on the same chip in the same process).
    The reported SoL is max(memory, compute) — the tighter ceiling.
    """
    mem_ms = bytes_moved / (bw_gbps * 1e9) * 1000
    compute_ms = 0.0
    if mont_muls and _CAL.get("montmul_elt_ns"):
        compute_ms += mont_muls * _CAL["montmul_elt_ns"] * 1e-6
    if compressions and _CAL.get("blake2b_compression_ns"):
        compute_ms += compressions * _CAL["blake2b_compression_ns"] * 1e-6
    sol_ms = max(mem_ms, compute_ms)
    return {
        f"{name}_sol_ms": round(sol_ms, 3),
        f"{name}_sol_bound": "compute" if compute_ms > mem_ms else "memory",
        f"{name}_pct_sol": round(100 * sol_ms / measured_ms, 1),
    }


def bench_montmul_micro() -> dict:
    """Calibration: bare Montgomery-multiply kernels, two layouts.

    The speed-of-light reference is the *limb-plane Pallas* multiply (the
    layout of the NTT / fold / Merkle kernels): a [8, rows, 128] tile stays
    in VMEM while K unrolled y <- y*x multiplies run on full 8x128 VPU
    tiles.  The [n, 8] XLA-layout chain is also measured (that is the form
    the verifier / generic poly kernels use) but NOT used as the ceiling —
    its minor-axis limb indexing costs ~4x (measured r4: 1.07 vs ~0.25
    ns/elt), which is a layout artifact, not a hardware limit.
    """
    import jax.numpy as jnp

    from zk_stark_tpu.field import FIELD_PRIME as P
    from zk_stark_tpu.ops import limbs as L
    import random

    random.seed(7)
    n = 1 << 18
    out = {}

    # XLA [n, 8] layout chain (secondary diagnostic)
    iters = 64
    x = jnp.tile(
        L.ints_to_mont([random.randrange(P) for _ in range(4096)]),
        (n // 4096, 1),
    )

    def chain(a):
        return jax.lax.fori_loop(
            0, iters, lambda i, y: L.mont_mul(y, a), a
        )

    f = jax.jit(chain)
    y = f(x)
    dsync(y)
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        y = f(x)
        dsync(y)
        best = min(best, time.time() - t0 - _RTT_MS / 1000)
    xla_ns = best / (iters * n) * 1e9
    out["montmul_xla_elt_ns"] = round(xla_ns, 4)
    ns = xla_ns

    # limb-plane Pallas chain (the calibration ceiling on TPU)
    try:
        import functools

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from zk_stark_tpu.ops.ntt_pallas import mont_mul_planes

        k_unroll = 32
        rows = n // 128

        def kern(x_ref, o_ref):
            xs = [x_ref[k] for k in range(8)]
            ys = xs
            for _ in range(k_unroll):
                ys = mont_mul_planes(ys, xs)
            for k in range(8):
                o_ref[k] = ys[k]

        spec = pl.BlockSpec(
            (8, 128, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
        call = pl.pallas_call(
            kern,
            grid=(rows // 128,),
            out_shape=jax.ShapeDtypeStruct((8, rows, 128), jnp.uint32),
            in_specs=[spec],
            out_specs=spec,
        )
        g = jax.jit(lambda a: call(a))
        planes = jnp.swapaxes(x.reshape(rows, 128, 8), 0, 2)
        planes = jnp.swapaxes(planes, 1, 2)  # [8, rows, 128]
        yp = g(planes)
        dsync(yp)
        # amortize: dispatches queue asynchronously, ONE fetch at the end —
        # a single 8-mul call (~0.5 ms) is invisible next to RTT noise
        calls = 40
        best_p = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(calls):
                yp = g(yp)
            dsync(yp)
            best_p = min(
                best_p, (time.time() - t0 - _RTT_MS / 1000) / calls
            )
        assert best_p > 0, "montmul micro under transport noise floor"
        ns = best_p / (k_unroll * n) * 1e9
        out["montmul_plane_chain_ms"] = round(best_p * 1000, 3)
    except Exception as e:
        log(f"plane montmul micro unavailable ({e!r}); using XLA layout")

    _CAL["montmul_elt_ns"] = ns
    out["montmul_elt_ns"] = round(ns, 4)
    out["montmul_elts_per_s"] = round(1e9 / ns)
    return out


def bench_blake2b_micro() -> dict:
    """Calibration: bare single-block BLAKE2b-512 compressions (no tree
    levels, no decimal leaf encoding) via the Pallas kernel."""
    import jax.numpy as jnp

    from zk_stark_tpu.ops import blake2b_dev as B

    m = 1 << 18
    iters = 8

    def body(i, d):
        # feed each digest back as a 128-byte two-child message: every
        # iteration is exactly m dependent compressions
        mhi = jnp.concatenate([d[0], d[0]], axis=0)
        mlo = jnp.concatenate([d[1], d[1]], axis=0)
        t = jnp.full((m,), 128, jnp.uint32)
        return B._compress_words(mhi, mlo, t)

    f = jax.jit(
        lambda d0: jax.lax.fori_loop(0, iters, body, d0)
    )
    d0 = jnp.ones((2, 8, m), jnp.uint32)
    d = f(d0)
    dsync(d)
    calls = 8
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(calls):
            d = f(d)
        dsync(d)
        best = min(best, (time.time() - t0 - _RTT_MS / 1000) / calls)
    assert best > 0, "blake2b micro under transport noise floor"
    ns = best / (iters * m) * 1e9
    _CAL["blake2b_compression_ns"] = ns
    return {
        "blake2b_compress_chain_ms": round(best * 1000, 3),
        "blake2b_compression_ns": round(ns, 4),
        "blake2b_compressions_per_s": round(1e9 / ns),
    }


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

    dsync(y)  # compile
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        y = transform(y, root)
    dsync(y)
    dt = (time.time() - t0 - _RTT_MS / 1000) / reps
    butterflies = (n // 2) * logn
    out = {
        "ntt_2p20_ms": round(dt * 1000, 3),
        "ntt_2p20_butterflies_per_s": round(butterflies / dt),
        "ntt_2p20_kernel": which,
    }
    bw = _BW.get("hbm_bw_gbps")
    if bw:
        # fused four-step traffic: bit-reverse gather (r+w), pallas pass 1
        # incl. four-step twiddle read (2r+w), transpose+bit-reverse (r+w),
        # pallas pass 2 (r+w), final transpose (r+w) ~= 11 array transits;
        # compute: n/2*log2(n) butterfly muls + n twiddle muls
        out.update(
            _roofline(
                "ntt_2p20", out["ntt_2p20_ms"], 11 * n * _ELT, bw,
                mont_muls=butterflies + n,
            )
        )
    return out


def bench_ntt_sweep(logns=(21, 22)) -> dict:
    """MEASURED Pallas NTT at 2^21 and 2^22 (VERDICT r3 item 1: the former
    SCALING projection extrapolated the 2^22 time from 2^20; 2^22 x 32 B =
    128 MB fits single-chip HBM trivially, so measure it).  Each size is
    validated by a full inverse-transform roundtrip on device."""
    import random

    import jax.numpy as jnp

    from zk_stark_tpu.field import Field, FIELD_PRIME as P
    from zk_stark_tpu.ops import limbs as L
    from zk_stark_tpu.ops.ntt import scalar_mul_mont

    from zk_stark_tpu.ops.ntt_pallas import ntt_mont_pallas

    field = Field()
    random.seed(4)
    out = {}
    for logn in logns:
        n = 1 << logn
        root = field.primitive_nth_root(n).value
        x = jnp.tile(
            L.ints_to_mont([random.randrange(P) for _ in range(4096)]),
            (n // 4096, 1),
        )
        y = ntt_mont_pallas(x, root)
        # roundtrip: intt(ntt(x)) must reproduce x exactly
        x2 = scalar_mul_mont(
            ntt_mont_pallas(y, pow(root, -1, P)), pow(n, -1, P)
        )
        if not bool(jnp.all(x2 == x)):
            raise SystemExit(f"pallas NTT 2^{logn} roundtrip mismatch")
        dsync(y)
        reps = 10
        t0 = time.time()
        for _ in range(reps):
            y = ntt_mont_pallas(y, root)
        dsync(y)
        dt = (time.time() - t0 - _RTT_MS / 1000) / reps
        butterflies = (n // 2) * logn
        tag = f"ntt_2p{logn}"
        out[f"{tag}_ms"] = round(dt * 1000, 3)
        out[f"{tag}_butterflies_per_s"] = round(butterflies / dt)
        bw = _BW.get("hbm_bw_gbps")
        if bw:
            out.update(
                _roofline(
                    tag, out[f"{tag}_ms"], 11 * n * _ELT, bw,
                    mont_muls=butterflies + n,
                )
            )
        log(f"ntt sweep 2^{logn}: {out[f'{tag}_ms']} ms")
    return out


def bench_rescue_batch() -> dict:
    from zk_stark_tpu.field import Field
    from zk_stark_tpu.models.rescue_prime import RescuePrime
    from zk_stark_tpu.ops import limbs as L

    field = Field()
    rp = RescuePrime(field)
    b = 1 << 14
    inputs = L.ints_to_mont(list(range(b)))
    out = rp.hash_batch_device(inputs)
    dsync(out)  # compile
    # hardware parity: the TPU plane-layout kernel vs host golden hashes
    # (the CPU suite only exercises the column-layout kernel)
    got = [int(v) for v in L.mont_to_ints(out[:4])]
    want = [rp.hash(x) for x in range(4)]
    assert got == want, f"device rescue diverged from host: {got} vs {want}"
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        out = rp.hash_batch_device(inputs)
    dsync(out)
    dt = (time.time() - t0 - _RTT_MS / 1000) / reps
    out = {
        "rescue_hash_2p14_ms": round(dt * 1000, 3),
        "rescue_hashes_per_s": round(b / dt),
    }
    bw = _BW.get("hbm_bw_gbps")
    if bw:
        # compute-bound: per element, 27 rounds of x^3 (2 muls) + MDS (4) +
        # x^alpha_inv (~170 windowed muls) + MDS (4); memory: in + out
        muls = b * 27 * (2 + 4 + 170 + 4)
        out.update(
            _roofline(
                "rescue_2p14", out["rescue_hash_2p14_ms"],
                2 * b * _ELT, bw, mont_muls=muls,
            )
        )
    return out


def bench_fold_2p20() -> dict:
    """One fused FRI fold round (fold + canonical conversion) at 2^20."""
    import random

    import jax.numpy as jnp

    from zk_stark_tpu.field import FIELD_PRIME as P
    from zk_stark_tpu.field import Field
    from zk_stark_tpu.fri import _fold_round_kernel
    from zk_stark_tpu.ops import limbs as L
    from zk_stark_tpu.ops.ntt import powers_mont

    field = Field()
    random.seed(1)
    n = 1 << 20
    omega = field.primitive_nth_root(n).value
    cw = jnp.tile(
        L.ints_to_mont([random.randrange(P) for _ in range(4096)]),
        (n // 4096, 1),
    )
    invpows = powers_mont(pow(omega, -1, P), n // 2)
    ao = L.int_to_mont(12345 * pow(field.generator().value, -1, P) % P)
    two_inv = L.int_to_mont(pow(2, -1, P))
    kern = _fold_round_kernel(n)
    folded, canon = kern(cw, invpows, ao, two_inv)
    dsync(canon)
    reps = 60  # ~0.5 ms/rep must dominate the ~30 ms RTT correction
    t0 = time.time()
    for _ in range(reps):
        folded, canon = kern(cw, invpows, ao, two_inv)
    dsync(canon)
    dt = (time.time() - t0 - _RTT_MS / 1000) / reps
    out = {"fold_2p20_ms": round(dt * 1000, 3)}
    bw = _BW.get("hbm_bw_gbps")
    if bw:
        # read cw (n) + invpows (n/2), write folded + canon (n/2 each);
        # muls per output: factors, f*d, *2^-1 (full) + canonicalizing
        # REDC at half cost = 3.5 * n/2 full-multiply equivalents
        out.update(
            _roofline(
                "fold_2p20", out["fold_2p20_ms"],
                int(2.5 * n) * _ELT, bw, mont_muls=1.75 * n,
            )
        )
    return out


def bench_merkle_2p18() -> dict:
    """Merkle commitment of a 2^18 codeword: device BLAKE2b vs host C++.

    The device tree (ops/blake2b_dev.py) keeps digests on device and moves
    64 bytes to the host; the host path moves the 8 MiB canonical array and
    hashes on CPU threads (VERDICT r1 item 6).
    """
    import random

    from zk_stark_tpu import merkle
    from zk_stark_tpu.field import FIELD_PRIME as P
    from zk_stark_tpu.ops import limbs as L

    import numpy as np

    random.seed(2)
    n = 1 << 18
    base = L.ints_to_limbs([random.randrange(P) for _ in range(4096)])
    limbs_np = np.tile(base, (n // 4096, 1))
    import jax.numpy as jnp

    limbs_dev = jnp.asarray(limbs_np)

    dev_tree = merkle.tree_for_codeword(limbs_dev, device=True)  # compile
    t0 = time.time()
    dev_tree = merkle.tree_for_codeword(limbs_dev, device=True)
    root_dev = dev_tree.root
    dev_ms = (time.time() - t0) * 1000

    # pure device hashing work, amortized over reps so the mandatory
    # top-of-tree fetch round trip (~_RTT_MS of transport latency, not
    # device time) drops out: dispatch K level-stack builds, sync once
    builder = merkle._tree_builder(n, 256)
    reps = 5
    levels = builder(limbs_dev)
    dsync(levels[-1])
    t0 = time.time()
    for _ in range(reps):
        levels = builder(limbs_dev)
    dsync(levels[-1])
    work_ms = (time.time() - t0 - _RTT_MS / 1000) / reps * 1000

    t0 = time.time()
    host_tree = merkle.tree_for_codeword(limbs_np, device=False)
    host_ms = (time.time() - t0) * 1000
    assert root_dev == host_tree.root, "device/host Merkle root mismatch"

    out = {
        "merkle_2p18_device_ms": round(dev_ms, 2),
        "merkle_2p18_device_work_ms": round(work_ms, 2),
        "merkle_2p18_host_ms": round(host_ms, 2),
        "merkle_2p18_hashes_per_s": round((2 * n - 1) / (work_ms / 1000)),
    }
    bw = _BW.get("hbm_bw_gbps")
    if bw:
        # ceiling: ~2n single-block compressions at the measured bare
        # Pallas compression rate vs digest traffic (r+w per level)
        out.update(
            _roofline(
                "merkle_2p18", work_ms, 3 * n * 64, bw,
                compressions=2 * n,
            )
        )
    return out


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

    from zk_stark_tpu.utils.profiling import StageTimer

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
    timer = StageTimer()
    stark.timer = timer
    t0 = time.time()
    proof = stark.prove(trace, air, boundary, ProofStream(field))
    prove_ms = (time.time() - t0) * 1000
    stark.timer = None
    log("chain stage breakdown:\n" + timer.report())
    t0 = time.time()
    stark.verify(air, boundary, ProofStream.deserialize(proof, field))
    verify_cold_ms = (time.time() - t0) * 1000
    vtimer = StageTimer()
    stark.timer = vtimer
    t0 = time.time()
    with vtimer.stage("v_deserialize"):
        ps_v = ProofStream.deserialize(proof, field)
    stark.verify(air, boundary, ps_v)
    verify_ms = (time.time() - t0) * 1000
    stark.timer = None
    log("chain verify stage breakdown:\n" + vtimer.report())
    key = f"chain{chain_len}_fri_2p{stark.fri.domain_length.bit_length() - 1}"
    return {
        f"{key}_prove_ms": round(prove_ms, 1),
        f"{key}_prove_cold_ms": round(cold_ms, 1),
        f"{key}_verify_ms": round(verify_ms, 1),
        f"{key}_verify_cold_ms": round(verify_cold_ms, 1),
        f"{key}_proof_bytes": len(proof),
        f"{key}_stages_ms": {
            k: round(v * 1000, 1) for k, v in timer.totals.items()
        },
        f"{key}_verify_stages_ms": {
            k: round(v * 1000, 1) for k, v in vtimer.totals.items()
        },
    }


#: measured HBM bandwidth, filled by main() before the kernel benches
_BW: dict = {}

#: wall-clock start + budget (seconds): the driver kills `python bench.py`
#: after an undocumented cap (~20-30 min observed; the r4 record died at
#: rc=124 with NOTHING parsed because the single headline line printed only
#: after every section).  The fix is structural: the headline JSON prints as
#: soon as the mandatory suite + RPSSS are measured, expensive optional
#: sections run only while the internal budget allows, and the process
#: always exits 0 well inside the cap.
_START = time.time()
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1200"))


def _remaining() -> float:
    return _BUDGET_S - (time.time() - _START)


def main() -> None:
    global _RTT_MS
    log(f"devices: {jax.devices()}  (budget {_BUDGET_S:.0f} s)")
    extras = {}
    skipped: list[str] = []
    _RTT_MS = _measure_rtt()
    extras["dispatch_rtt_ms"] = round(_RTT_MS, 1)
    log(f"dispatch+fetch rtt: {_RTT_MS:.1f} ms")
    if os.environ.get("BENCH_ONLY_CHAIN"):
        # flagship-scale chain run only (BENCH_CHAIN_FULL=1 for 2^20):
        # headline switches to the chain prove time
        extras.update(bench_chain())
        key = next(k for k in extras if k.endswith("_prove_ms"))
        print(
            json.dumps(
                {
                    "metric": key,
                    "value": extras[key],
                    "unit": "ms",
                    "vs_baseline": 0.0,
                    "extra": extras,
                }
            )
        )
        return

    #: seconds reserved for the RPSSS headline section (cold compiles incl.)
    reserve = 420.0

    def section(name: str, fn, est: float, required: bool = False):
        """Run one kernel-suite section unless it would eat into the RPSSS
        reserve; failures are logged, never fatal (the headline must print
        regardless)."""
        if not required and _remaining() - est < reserve:
            log(f"section {name} skipped ({est:.0f}s est vs "
                f"{_remaining():.0f}s left, {reserve:.0f}s reserved)")
            skipped.append(name)
            return
        t0 = time.time()
        try:
            extras.update(fn())
            log(f"{name} [{time.time() - t0:.0f}s]: {extras}")
        except SystemExit:
            raise
        except Exception as e:
            log(f"section {name} failed after {time.time() - t0:.0f}s: {e!r}")
            skipped.append(name + ":failed")

    def _hbm():
        _BW.update(bench_hbm_bw())
        return _BW

    section("hbm", _hbm, 40)
    section("montmul_micro", bench_montmul_micro, 60)
    section("blake2b_micro", bench_blake2b_micro, 40)
    section("ntt_2p20", bench_ntt_2p20, 180)
    section("fold_2p20", bench_fold_2p20, 60)
    section("rescue", bench_rescue_batch, 120)
    section("merkle", bench_merkle_2p18, 120)

    rp = {}
    t0 = time.time()
    rp = bench_rpsss()
    extras.update(rp)
    log(f"rpsss [{time.time() - t0:.0f}s]: {rp}")

    # calibrated-roofline sanity (VERDICT r3 item 2): a kernel cannot beat
    # its own measured speed-of-light; >108% means the model is wrong again
    bad = {
        k: v
        for k, v in extras.items()
        if k.endswith("_pct_sol") and v > 108
    }
    assert not bad, f"roofline miscalibrated, kernels above SoL: {bad}"

    if skipped:
        extras["skipped_sections"] = skipped

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
    sys.stdout.flush()

    # ---- optional sections: AFTER the headline line, budget-gated, results
    # to a side artifact (stdout stays one JSON line for the driver) --------
    cold = extras.get("sign_cold_ms", 0) > 20000  # transport compiling cold?
    optional = []
    if not os.environ.get("BENCH_SKIP_NTT_SWEEP"):
        optional.append(("ntt_sweep", bench_ntt_sweep, 500 if cold else 150))
    if not os.environ.get("BENCH_SKIP_CHAIN"):
        optional.append(("chain", bench_chain, 900 if cold else 300))
    side = {}
    for name, fn, est in optional:
        if _remaining() < est:
            log(f"optional {name} skipped ({est:.0f}s est vs "
                f"{_remaining():.0f}s left)")
            skipped.append("optional:" + name)
            continue
        t0 = time.time()
        try:
            side.update(fn())
            log(f"optional {name} [{time.time() - t0:.0f}s]")
        except SystemExit as e:
            log(f"optional {name} validation failure: {e}")
            skipped.append(f"optional:{name}:invalid")
        except Exception as e:
            log(f"optional {name} failed after {time.time() - t0:.0f}s: {e!r}")
            skipped.append(f"optional:{name}:failed")
    if side or skipped:
        side["skipped_sections"] = skipped
        side["headline"] = {"metric": "rpsss_sign_ms", "value": value}
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_EXTRAS.json")
        with open(path, "w") as f:
            json.dump(side, f, indent=1)
        log(f"optional-section results -> {path}")


if __name__ == "__main__":
    main()
