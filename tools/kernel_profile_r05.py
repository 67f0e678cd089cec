#!/usr/bin/env python
"""Round-5 kernel decomposition: where do Merkle 9.96 ms and NTT 6.57 ms go?

VERDICT r4 items 3/4 name suspects (decimal leaf encode + level
de-interleave; stage twiddles + transposes) but nothing was measured
piecewise.  This times each pipeline component amortized on the real TPU.
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

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


_SYNC = jax.jit(lambda a: a.reshape(-1)[:4])


def dsync(x):
    np.asarray(_SYNC(x))


def rtt_ms():
    x = jnp.zeros((128,), jnp.uint32)
    dsync(x)
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        dsync(x)
        best = min(best, time.time() - t0)
    return best * 1000


def timeit(fn, arg, reps, rtt):
    y = fn(arg)
    dsync(y if not isinstance(y, (tuple, list)) else y[-1])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            y = fn(arg)
        dsync(y if not isinstance(y, (tuple, list)) else y[-1])
        best = min(best, (time.time() - t0 - rtt / 1000) / reps)
    return best * 1000


def main():
    import random

    from zk_stark_tpu.field import Field, FIELD_PRIME as P
    from zk_stark_tpu.ops import limbs as L
    from zk_stark_tpu.ops import blake2b_dev as B
    from zk_stark_tpu import merkle

    out = {}
    rtt = rtt_ms()
    out["rtt_ms"] = round(rtt, 1)
    log(f"rtt {rtt:.1f} ms")

    # ---- Merkle decomposition at 2^18 --------------------------------------
    random.seed(2)
    n = 1 << 18
    base = L.ints_to_limbs([random.randrange(P) for _ in range(4096)])
    canon = jnp.asarray(np.tile(base, (n // 4096, 1)))

    leaf_jit = jax.jit(B.leaf_digests_packed)
    out["merkle_leaf_ms"] = round(timeit(leaf_jit, canon, 10, rtt), 3)
    log(f"leaf_digests_packed: {out['merkle_leaf_ms']} ms")

    # leaf message encode alone (no compression)
    msg_jit = jax.jit(lambda c: B._leaf_message(c)[0])
    out["merkle_leaf_encode_ms"] = round(timeit(msg_jit, canon, 10, rtt), 3)
    log(f"leaf encode alone: {out['merkle_leaf_encode_ms']} ms")

    # compression alone on prebuilt messages
    mhi, mlo, ln = jax.jit(B._leaf_message)(canon)
    comp_jit = jax.jit(lambda t: B._compress_words(t[0], t[1], t[2]))
    out["merkle_leaf_compress_ms"] = round(
        timeit(comp_jit, (mhi, mlo, ln), 10, rtt), 3
    )
    log(f"leaf compress alone: {out['merkle_leaf_compress_ms']} ms")

    # node levels alone: full split-layout level reduction from leaf digests
    d0 = leaf_jit(canon)

    def levels(d):
        m = n
        while m > 256:
            d = B.node_digests_split(d)
            m //= 2
        return d

    lev_jit = jax.jit(levels)
    out["merkle_nodes_ms"] = round(timeit(lev_jit, d0, 10, rtt), 3)
    log(f"node levels alone: {out['merkle_nodes_ms']} ms")

    # single biggest node level (2^18 -> 2^17)
    n1_jit = jax.jit(B.node_digests_split)
    out["merkle_node_l0_ms"] = round(timeit(n1_jit, d0, 10, rtt), 3)
    log(f"first node level alone: {out['merkle_node_l0_ms']} ms")

    # the one-time leaf brev row gather
    from zk_stark_tpu.ops.ntt import _brev

    gj = jax.jit(lambda c: jnp.take(c, _brev(n), axis=0))
    out["merkle_brev_gather_ms"] = round(timeit(gj, canon, 10, rtt), 3)
    log(f"leaf brev gather: {out['merkle_brev_gather_ms']} ms")

    # full builder for reference
    builder = merkle._tree_builder(n, 256)
    out["merkle_builder_ms"] = round(
        timeit(lambda c: builder(c)[-1], canon, 10, rtt), 3
    )
    log(f"full builder: {out['merkle_builder_ms']} ms")

    # ---- NTT decomposition at 2^20 -----------------------------------------
    from zk_stark_tpu.field import Field
    from zk_stark_tpu.ops.ntt import _brev
    from zk_stark_tpu.ops import ntt_pallas as NP

    field = Field()
    logn = 20
    nn = 1 << logn
    root = field.primitive_nth_root(nn).value
    x = jnp.asarray(
        np.tile(
            np.asarray(L.ints_to_mont(
                [random.randrange(P) for _ in range(4096)]
            )),
            (nn // 4096, 1),
        )
    )

    full = jax.jit(lambda a: NP.ntt_mont_pallas(a, root))
    out["ntt_full_ms"] = round(timeit(full, x, 10, rtt), 3)
    log(f"ntt full: {out['ntt_full_ms']} ms")

    r = 1 << 10
    c = nn // r
    brev_r = _brev(r)

    # stage A: reshape + brev gather + transpose to planes
    def stage_a(a):
        x2 = a.reshape(r, c, 8)
        xb = jnp.take(x2, brev_r, axis=0)
        return xb.transpose(2, 0, 1)

    ja = jax.jit(stage_a)
    out["ntt_brev_transpose_ms"] = round(timeit(ja, x, 10, rtt), 3)
    log(f"brev+transpose to planes: {out['ntt_brev_transpose_ms']} ms")

    planes = ja(x)
    p = L.P
    tw_r = NP._stage_tw_dev(pow(root, c, p), r)
    ft = NP._ft_planes(root, r, c)

    jb = jax.jit(lambda a: NP.ntt_planes(a, tw_r, ft, n=r))
    out["ntt_pass1_ms"] = round(timeit(jb, planes, 10, rtt), 3)
    log(f"pallas pass1 (fused ft): {out['ntt_pass1_ms']} ms")

    y = jb(planes)
    brev_c = _brev(c)

    def stage_c(a):
        return jnp.take(a.transpose(0, 2, 1), brev_c, axis=1)

    jc = jax.jit(stage_c)
    out["ntt_transpose_brev2_ms"] = round(timeit(jc, y, 10, rtt), 3)
    log(f"transpose+brev2: {out['ntt_transpose_brev2_ms']} ms")

    yt = jc(y)
    tw_c = NP._stage_tw_dev(pow(root, r, p), c)
    jd = jax.jit(lambda a: NP.ntt_planes(a, tw_c, None, n=c))
    out["ntt_pass2_ms"] = round(timeit(jd, yt, 10, rtt), 3)
    log(f"pallas pass2: {out['ntt_pass2_ms']} ms")

    z = jd(yt)
    je = jax.jit(lambda a: a.transpose(1, 2, 0).reshape(nn, 8))
    out["ntt_final_transpose_ms"] = round(timeit(je, z, 10, rtt), 3)
    log(f"final transpose: {out['ntt_final_transpose_ms']} ms")

    # pure gather alone (no transpose)
    jg = jax.jit(lambda a: jnp.take(a.reshape(r, c, 8), brev_r, axis=0))
    out["ntt_brev_gather_only_ms"] = round(timeit(jg, x, 10, rtt), 3)
    log(f"brev gather only: {out['ntt_brev_gather_only_ms']} ms")

    # pure transpose alone on planes
    jt = jax.jit(lambda a: a.transpose(0, 2, 1))
    out["ntt_transpose_only_ms"] = round(timeit(jt, y, 10, rtt), 3)
    log(f"plane transpose only: {out['ntt_transpose_only_ms']} ms")

    print(json.dumps(out))
    with open(os.path.join(REPO, ".kernel_profile_r05.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
