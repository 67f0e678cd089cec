#!/usr/bin/env python
"""Cold-start investigation: does ANY compile artifact survive the process?

VERDICT r3 item 10: cold RPSSS sign costs ~193 s, chain-3200 prove ~11 min,
almost all of it XLA compiles that recur per process because the axon
remote-compile transport does not replay the persistent cache reliably
(CLAUDE.md).  This probe produces the evidence:

1. compiles a mid-size marker kernel (unique per --tag so runs can't alias),
   times it, and lists which files appear under the persistent cache dir;
2. re-runs itself in a FRESH subprocess with the same tag and times the
   same compile — a working cross-process cache makes run 2 fast;
3. tries `jax.export` serialize/deserialize round-trip and times how much
   of the cost deserialization actually avoids;
4. tries PJRT loaded-executable serialization (the layer the persistent
   cache uses) directly.

Writes AOT_PROBE_r04.json (run 1) — the "documented finding" deliverable.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def log(m):
    print(m, file=sys.stderr, flush=True)


def marker_fn(tag: int):
    import jax
    import jax.numpy as jnp

    from zk_stark_tpu.ops import limbs as L

    def f(x):
        def body(i, y):
            return L.mont_mul(y, L.add_mod(x, y))

        y = jax.lax.fori_loop(0, 24, body, x)
        return y ^ jnp.uint32(tag)

    return jax.jit(f)


def run_once(tag: int) -> dict:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", CACHE)
    import jax

    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    import jax.numpy as jnp

    import numpy as np

    out = {"backend": jax.default_backend()}
    x = jnp.ones((1 << 16, 8), jnp.uint32)
    before = set(os.listdir(CACHE)) if os.path.isdir(CACHE) else set()
    f = marker_fn(tag)
    t0 = time.time()
    np.asarray(f(x))[:1]
    out["first_call_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    np.asarray(f(x))[:1]
    out["warm_call_s"] = round(time.time() - t0, 2)
    after = set(os.listdir(CACHE)) if os.path.isdir(CACHE) else set()
    out["cache_new_files"] = sorted(after - before)
    out["cache_total_files"] = len(after)

    # jax.export round trip
    try:
        from jax import export

        t0 = time.time()
        exp = export.export(marker_fn(tag + 1))(x)
        blob = exp.serialize()
        out["export_serialize_s"] = round(time.time() - t0, 2)
        out["export_blob_bytes"] = len(blob)
        t0 = time.time()
        back = export.deserialize(blob)
        np.asarray(back.call(x))[:1]
        out["export_deser_first_call_s"] = round(time.time() - t0, 2)
    except Exception as e:
        out["export_error"] = repr(e)

    # PJRT loaded-executable serialization (the persistent cache layer)
    try:
        lowered = marker_fn(tag + 2).lower(x)
        t0 = time.time()
        compiled = lowered.compile()
        out["aot_compile_s"] = round(time.time() - t0, 2)
        ser = None
        for attr in ("runtime_executable", "xla_executable"):
            try:
                ser = getattr(compiled, attr)().serialize()
                break
            except Exception:
                continue
        if ser is None:
            ex = getattr(compiled, "_executable", None)
            ser = ex.xla_executable.serialize()
        out["pjrt_serialized_bytes"] = len(ser)
    except Exception as e:
        out["pjrt_serialize_error"] = repr(e)
    return out


def main() -> None:
    if os.environ.get("ZK_AOT_CHILD"):
        print("CHILD " + json.dumps(run_once(int(os.environ["ZK_AOT_CHILD"]))))
        return
    tag = int(time.time()) & 0xFFFFFF
    log(f"run 1 (tag {tag})...")
    r1 = run_once(tag)
    log(f"run 1: {r1}")
    env = dict(os.environ, ZK_AOT_CHILD=str(tag))
    log("run 2 (fresh subprocess, same tag)...")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    r2 = {}
    for line in proc.stdout.splitlines():
        if line.startswith("CHILD "):
            r2 = json.loads(line[6:])
    sys.stderr.write(proc.stderr[-2000:])
    result = {
        "run1": r1,
        "run2_fresh_process": r2,
        "run2_wall_s": round(time.time() - t0, 2),
        "cross_process_cache_hit": bool(r2)
        and r2.get("first_call_s", 9e9) < max(1.0, r1["first_call_s"] / 3),
    }
    out = os.path.join(REPO, "AOT_PROBE_r04.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    log(f"wrote {out}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
