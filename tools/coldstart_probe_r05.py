#!/usr/bin/env python
"""Round-5 cold-start decomposition on the real TPU.

AOT_PROBE_r04 left an ambiguity: its run-2 "export deserializes in 0.4 s"
was measured *after* that process had already paid a 289 s first jit call,
so backend init / first-dispatch setup may be the real cost, not compile.
This probe separates the phases in ONE fresh process:

  t_import   — import jax
  t_devices  — jax.devices() (backend/tunnel init)
  t_tiny     — first trivial jit dispatch+fetch (first-dispatch setup)
  t_marker   — the r4 marker kernel via jit (compile via jit path)
  t_aot      — an identical-shape DIFFERENT marker via lower().compile()
  t_exportload — deserialize a blob persisted by a PREVIOUS process and
                 call it (the true cross-process AOT story), if present;
                 else export+persist for the next run.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
BLOB = os.path.join(REPO, ".probe_export_blob")
TAG = int(os.environ.get("ZK_PROBE_TAG", "7701"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    out = {"tag": TAG}
    t0 = time.time()
    import jax
    out["t_import_s"] = round(time.time() - t0, 2)
    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    t0 = time.time()
    devs = jax.devices()
    out["t_devices_s"] = round(time.time() - t0, 2)
    out["backend"] = jax.default_backend()
    log(f"devices: {devs} ({out['t_devices_s']} s)")

    import jax.numpy as jnp
    import numpy as np

    t0 = time.time()
    np.asarray(jax.jit(lambda a: a + 1)(jnp.zeros((8,), jnp.uint32)))
    out["t_tiny_s"] = round(time.time() - t0, 2)
    log(f"tiny jit: {out['t_tiny_s']} s")

    from zk_stark_tpu.ops import limbs as L

    def marker(tag):
        def f(x):
            def body(i, y):
                return L.mont_mul(y, L.add_mod(x, y))
            y = jax.lax.fori_loop(0, 24, body, x)
            return y ^ jnp.uint32(tag)
        return f

    x = jnp.ones((1 << 16, 8), jnp.uint32)
    t0 = time.time()
    np.asarray(jax.jit(marker(TAG))(x))[:1]
    out["t_marker_jit_s"] = round(time.time() - t0, 2)
    log(f"marker jit: {out['t_marker_jit_s']} s")

    t0 = time.time()
    compiled = jax.jit(marker(TAG + 1)).lower(x).compile()
    out["t_marker_aot_compile_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    np.asarray(compiled(x))[:1]
    out["t_marker_aot_call_s"] = round(time.time() - t0, 2)
    log(f"marker aot: {out['t_marker_aot_compile_s']} s compile, "
        f"{out['t_marker_aot_call_s']} s call")

    from jax import export as jexport

    if os.path.exists(BLOB):
        with open(BLOB, "rb") as f:
            blob = f.read()
        t0 = time.time()
        back = jexport.deserialize(blob)
        out["t_export_deser_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        np.asarray(back.call(x))[:1]
        out["t_export_first_call_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        np.asarray(back.call(x))[:1]
        out["t_export_second_call_s"] = round(time.time() - t0, 2)
        log(f"export load (cross-process): deser {out['t_export_deser_s']} s,"
            f" call {out['t_export_first_call_s']} s")
    else:
        t0 = time.time()
        exp = jexport.export(jax.jit(marker(TAG + 2)))(x)
        blob = exp.serialize()
        with open(BLOB, "wb") as f:
            f.write(blob)
        out["t_export_make_s"] = round(time.time() - t0, 2)
        out["export_blob_bytes"] = len(blob)
        log(f"export persisted ({len(blob)} B, {out['t_export_make_s']} s)")

    print("PROBE " + json.dumps(out))


if __name__ == "__main__":
    main()
