#!/usr/bin/env python
"""Multi-PROCESS prover run: jax.distributed over localhost (SURVEY §5).

Round 3 shipped the DCN-layout code (parallel.multihost initialize /
hybrid_mesh / engine_for_hybrid) but never executed an actual multi-process
run (VERDICT r3 item 6).  This tool drives one: the parent spawns
``--procs`` child processes on localhost; each child

1. calls ``multihost.initialize()`` (env-var form of
   ``jax.distributed.initialize`` — coordinator, process count, process id),
2. sees the GLOBAL device view (procs x 4 virtual CPU devices),
3. lays out ``multihost.hybrid_mesh()`` -> a [procs, 4] (proof=DCN, shard=ICI)
   grid and takes its own DCN row's engine via ``engine_for_hybrid``,
4. proves an independent RescuePrime STARK statement sharded over its row's
   4 devices (the row collectives — four-step NTT all_to_all, fold pairing —
   stay intra-process, exactly the layout rule the module documents),
5. verifies, checks byte-identity vs the single-device engine, and
6. exchanges proof digests ACROSS processes: a device all-gather over the
   DCN axis (gloo CPU collectives) with a coordinator key-value-store
   fallback, recording which path ran.

Parent writes MULTIPROC_r04.json.  Usage: python tools/multiproc_prove.py
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEVS_PER_PROC = 4


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# -----------------------------------------------------------------------------
# child
# -----------------------------------------------------------------------------


def child_main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache:
        # the env var alone does not activate the persistent cache on this
        # image; the config.update path does (same as bench.py)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception as e:  # older builds: fall back to kv-store exchange
        log(f"no gloo cpu collectives: {e!r}")

    from zk_stark_tpu.parallel import multihost

    t0 = time.time()
    assert multihost.initialize() is True, "distributed init did not run"
    init_ms = (time.time() - t0) * 1000

    pid = jax.process_index()
    nproc = jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    log(
        f"[proc {pid}] initialized: {nproc} processes, "
        f"{n_global} global / {n_local} local devices ({init_ms:.0f} ms)"
    )
    assert nproc == int(os.environ["JAX_NUM_PROCESSES"])
    assert n_global == nproc * DEVS_PER_PROC

    mesh = multihost.hybrid_mesh()
    assert mesh.devices.shape == (nproc, DEVS_PER_PROC)
    # this process's DCN row must hold exactly its local devices
    row = pid
    row_devs = list(mesh.devices[row])
    assert all(d.process_index == pid for d in row_devs), (
        "hybrid mesh row does not match process locality"
    )

    from zk_stark_tpu.field import Field
    from zk_stark_tpu.models.rescue_prime import RescuePrime
    from zk_stark_tpu.parallel.engine import Engine, engine_for_hybrid
    from zk_stark_tpu.proof_stream import ProofStream
    from zk_stark_tpu.stark import Stark

    F = Field()

    def det_rng(tag: bytes):
        counter = [0]

        def f(k: int) -> bytes:
            counter[0] += 1
            return hashlib.shake_256(
                tag + counter[0].to_bytes(8, "big")
            ).digest(k)

        return f

    # per-row independent statements: different inputs per DCN row
    rp = RescuePrime(F, 2, 1, 2, 27)
    inp = F.sample(bytes([0x42, pid])).value
    output = rp.hash(inp)
    trace = rp.trace(inp)
    boundary = rp.boundary_constraints(output)

    eng = engine_for_hybrid(mesh, row)
    stark = Stark(F, 4, 2, 2, 2, 28, 2, rng=det_rng(b"mp"), engine=eng)
    air = rp.transition_constraints(
        stark.omicron, stark.omicron_domain_length
    )
    t0 = time.time()
    proof = stark.prove(trace, air, boundary, ProofStream(F))
    prove_ms = (time.time() - t0) * 1000
    stark.verify(air, boundary, ProofStream.deserialize(proof, F))

    # byte-identity vs the single-device engine under the same rng
    stark1 = Stark(F, 4, 2, 2, 2, 28, 2, rng=det_rng(b"mp"), engine=Engine())
    proof1 = stark1.prove(trace, air, boundary, ProofStream(F))
    identical = proof == proof1
    digest = hashlib.blake2b(proof).hexdigest()
    log(
        f"[proc {pid}] row-sharded prove {prove_ms:.0f} ms, "
        f"{len(proof)} bytes, byte_identical={identical}"
    )

    # cross-process digest exchange over the coordination service (the DCN
    # control plane): set -> barrier -> get.  A device collective here can
    # hang without a recoverable timeout if the peers are skewed, so the
    # exchange uses the kv store; the barrier also synchronizes the
    # processes before interpreter exit (the shutdown barrier is strict).
    from jax._src import distributed as _dist

    client = _dist.global_state.client
    client.key_value_set(f"digest/{pid}", digest)
    client.wait_at_barrier("digests_ready", 1_800_000)
    digests = [
        client.blocking_key_value_get(f"digest/{q}", 1_800_000)
        for q in range(nproc)
    ]
    exchange = "coordinator_kv_store"

    assert digests[pid] == digest[: len(digests[pid])]
    result = {
        "process_id": pid,
        "num_processes": nproc,
        "global_devices": n_global,
        "local_devices": n_local,
        "init_ms": round(init_ms, 1),
        "prove_ms": round(prove_ms, 1),
        "proof_bytes": len(proof),
        "byte_identical_vs_single": identical,
        "dcn_exchange": exchange,
        "all_proof_digests": digests,
    }
    print("CHILD_RESULT " + json.dumps(result), flush=True)


# -----------------------------------------------------------------------------
# parent
# -----------------------------------------------------------------------------


def parent_main(procs: int, out: str) -> None:
    port = 29613
    # fail fast if the port is taken
    with socket.socket() as s:
        s.bind(("127.0.0.1", port))
    children = []
    for pid in range(procs):
        env = dict(os.environ)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES=str(procs),
            JAX_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=(
                env.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={DEVS_PER_PROC}"
            ).strip(),
            ZK_MP_CHILD="1",
            PYTHONPATH=f"{REPO}:" + env.get("PYTHONPATH", ""),
        )
        children.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    results = []
    ok = True
    for pid, ch in enumerate(children):
        stdout, stderr = ch.communicate(timeout=3600)
        sys.stderr.write(stderr)
        if ch.returncode != 0:
            ok = False
            log(f"child {pid} FAILED rc={ch.returncode}")
            continue
        for line in stdout.splitlines():
            if line.startswith("CHILD_RESULT "):
                results.append(json.loads(line[len("CHILD_RESULT "):]))
    payload = {
        "ok": ok and len(results) == procs,
        "procs": procs,
        "devices_per_proc": DEVS_PER_PROC,
        "results": results,
    }
    if results:
        d0 = results[0]["all_proof_digests"]
        payload["digests_consistent"] = all(
            r["all_proof_digests"] == d0 for r in results
        )
        payload["byte_identical_all"] = all(
            r["byte_identical_vs_single"] for r in results
        )
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    log(f"wrote {out}")
    print(json.dumps(payload))
    if not payload["ok"]:
        sys.exit(1)


def main() -> None:
    if os.environ.get("ZK_MP_CHILD"):
        child_main()
        return
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "MULTIPROC_r04.json")
    )
    args = ap.parse_args()
    parent_main(args.procs, args.out)


if __name__ == "__main__":
    main()
