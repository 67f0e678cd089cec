"""Standalone single-device drivers for Pallas interpret-mode parity checks.

Pallas ``interpret=True`` under the suite's 8-virtual-device CPU backend is
pathologically slow for the field-arithmetic kernels (measured r5: the FRI
fold at n=256 did not finish in 15 minutes with
``--xla_force_host_platform_device_count=8``, vs 2.5 s single-device — and
this reproduces on the round-4 tree, so it is an XLA-CPU multi-device
pathology, not a kernel regression).  The interpret tests therefore run in a
SUBPROCESS with the device-count flag stripped: tests/test_pallas_kernels.py
and tests/test_ntt_pallas.py spawn ``python -m tests.interp_checks <name>``
and assert on the CHECK-OK marker.

Each check prints ``CHECK-OK <name>`` on success and raises otherwise.
"""

from __future__ import annotations

import os
import sys


def _setup():
    # single-device CPU, isolated from the suite's 8-device flag
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = " ".join(
        t for t in flags.split() if "host_platform_device_count" not in t
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    # no persistent cache: see tests/conftest.py (foreign-machine AOT
    # entries in the shared dir hang at execution on this host)
    jax.config.update("jax_compilation_cache_dir", None)


def check_fold():
    import random

    import jax.numpy as jnp

    from zk_stark_tpu.field import Field, FIELD_PRIME as P
    from zk_stark_tpu.fri import _fold_round_kernel_cached
    from zk_stark_tpu.ops import fold_pallas
    from zk_stark_tpu.ops import limbs as L
    from zk_stark_tpu.ops.ntt import powers_mont
    from zk_stark_tpu.parallel.engine import DEFAULT

    field = Field()
    random.seed(6)
    n = 1 << 10
    omega = field.primitive_nth_root(n).value
    cw = L.ints_to_mont([random.randrange(P) for _ in range(n)])
    invpows = powers_mont(pow(omega, -1, P), n // 2)
    ao = L.int_to_mont(98765 * pow(field.generator().value, -1, P) % P)
    two_inv = L.int_to_mont(pow(2, -1, P))

    f_ref, c_ref = _fold_round_kernel_cached(n, DEFAULT)(
        cw, invpows, ao, two_inv
    )
    fold_pallas.INTERPRET = True
    assert fold_pallas.fold_supported(n)
    f_p, c_p = fold_pallas.fold_round_pallas(n)(cw, invpows, ao, two_inv)
    assert bool(jnp.all(f_p == f_ref))
    assert bool(jnp.all(c_p == c_ref))


def check_blake2b_leaf():
    """Fused-leaf coverage, decomposed to stay CPU-tractable.

    Interpret-evaluating the COMBINED leaf kernel (decimal encode + 12
    unrolled compression rounds, ~6k ops) costs >15 CPU-minutes on XLA-CPU,
    so the two halves are checked separately: (a) the in-kernel encode
    logic ``_leaf_tile`` as pure jnp against ``_leaf_message`` (identical
    math, different layout), and (b) the compression via the bare
    ``_compress_words`` Pallas kernel in interpret mode against hashlib.
    The combined kernel is cross-checked against host trees on real TPU
    (bench.py merkle section + tools/r05_kernel_check.py).
    """
    import hashlib
    import random

    import jax.numpy as jnp

    from zk_stark_tpu.field import FIELD_PRIME as P
    from zk_stark_tpu.ops import blake2b_dev as B
    from zk_stark_tpu.ops import limbs as L

    random.seed(8)
    vals = [0, 1, 9, 10, 99, 100, 10**38, 10**38 - 1, P - 1, P - 2] + [
        random.randrange(P) for _ in range(246)
    ]
    limbs = jnp.asarray(L.ints_to_limbs(vals))

    # (a) encode parity: plane-tile form vs column form
    n = len(vals)
    pad = (-n) % 128
    rows = (n + pad) // 128
    planes = jnp.pad(limbs, ((0, pad), (0, 0))).reshape(
        rows, 128, 8
    ).transpose(2, 0, 1)
    cols = [planes[k] for k in range(8)]
    mhi_t, mlo_t, len_t = B._leaf_tile(cols, cols[0].shape)
    mhi_c, mlo_c, len_c = B._leaf_message(limbs)
    for w in range(16):
        assert bool(
            jnp.all(mhi_t[w].reshape(-1)[:n] == mhi_c[w])
        ), f"mhi word {w} diverges"
        assert bool(
            jnp.all(mlo_t[w].reshape(-1)[:n] == mlo_c[w])
        ), f"mlo word {w} diverges"
    assert bool(jnp.all(len_t.reshape(-1)[:n] == len_c))

    # (b) compression parity: bare Pallas kernel, interpret mode
    B.INTERPRET = True
    d = B._compress_words(mhi_c, mlo_c, len_c)
    mat = B.packed_to_digest_np(d)
    exp = [hashlib.blake2b(str(v).encode()).digest() for v in vals]
    assert [mat[i].tobytes() for i in range(n)] == exp


def check_node_split():
    import hashlib
    import random

    import jax.numpy as jnp

    from zk_stark_tpu.field import FIELD_PRIME as P
    from zk_stark_tpu.ops import blake2b_dev as B
    from zk_stark_tpu.ops import limbs as L

    random.seed(9)
    vals = [random.randrange(P) for _ in range(256)]
    B.INTERPRET = True
    # leaf digests via the bare compression kernel (the combined fused
    # leaf kernel is too heavy for interpret mode, see check_blake2b_leaf)
    limbs = jnp.asarray(L.ints_to_limbs(vals))
    mhi, mlo, ln = B._leaf_message(limbs)
    leaves = B._compress_words(mhi, mlo, ln)
    # split layout: first half = left children (even i), second = right
    half = jnp.concatenate(
        [leaves[:, :, 0::2], leaves[:, :, 1::2]], axis=2
    )
    parents = B.packed_to_digest_np(B.node_digests_split(half))
    leaf_bytes = [hashlib.blake2b(str(v).encode()).digest() for v in vals]
    exp = [
        hashlib.blake2b(leaf_bytes[2 * i] + leaf_bytes[2 * i + 1]).digest()
        for i in range(128)
    ]
    assert [parents[i].tobytes() for i in range(128)] == exp


def check_ntt():
    import random

    from zk_stark_tpu.field import Field, FIELD_PRIME
    from zk_stark_tpu.ops import limbs as L
    from zk_stark_tpu.ops import ntt as N
    from zk_stark_tpu.ops import ntt_pallas as NP

    F = Field()
    NP.INTERPRET = True
    random.seed(11)
    n = 1 << 8
    vals = [random.randrange(FIELD_PRIME) for _ in range(n)]
    root = F.primitive_nth_root(n).value
    want = list(L.mont_to_ints(N.ntt_mont(L.ints_to_mont(vals), root)))
    got = list(
        L.mont_to_ints(NP.ntt_mont_pallas(L.ints_to_mont(vals), root))
    )
    assert got == want


CHECKS = {
    "fold": check_fold,
    "blake2b_leaf": check_blake2b_leaf,
    "node_split": check_node_split,
    "ntt": check_ntt,
}


def run_check_subprocess(name: str, timeout_s: int = 1200) -> None:
    """Spawn the named check in a fresh single-device process (test helper)."""
    import subprocess

    env = dict(os.environ)
    env["XLA_FLAGS"] = " ".join(
        t
        for t in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in t
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tests", "interp_checks.py"),
         name],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout_s,
    )
    assert proc.returncode == 0, (
        f"interp check {name} failed (rc={proc.returncode}):\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )
    assert f"CHECK-OK {name}" in proc.stdout


def main():
    name = sys.argv[1]
    _setup()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    CHECKS[name]()
    print(f"CHECK-OK {name}", flush=True)


if __name__ == "__main__":
    main()
