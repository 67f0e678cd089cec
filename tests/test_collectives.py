"""Pin the distributed collective layout — don't trust GSPMD silently.

VERDICT r2 #5: a silent all-gather in the sharded NTT or FRI fold would
still pass every byte-identity test while destroying the scaling story.
These tests inspect the *compiled* (post-SPMD-partitioning) HLO:

* the four-step NTT must contain exactly ONE all-to-all and no all-gather
  (parallel/ntt_dist.py four_step_local, the single implementation both the
  engine and the harness wrap);
* the sharded fold round must not all-gather the codeword: the lo/hi
  pairing is a fixed-offset exchange (collective-permute or all-to-all).
"""

import jax
import jax.numpy as jnp
import pytest

from zk_stark_tpu.field import Field
from zk_stark_tpu.ops import limbs as L
from zk_stark_tpu.ops.ntt import powers_mont
from zk_stark_tpu.parallel.engine import (
    _dist_ntt_call,
    _dist_twiddle,
    _four_step_geometry,
    dist_engine,
)

P = L.P
N_DEV = 8


def _count(hlo: str, op: str) -> int:
    # each collective appears once as "op-name(" or as async "op-name-start("
    return hlo.count(f" {op}(") + hlo.count(f" {op}-start(")


def _collective_counts(hlo: str) -> dict:
    return {
        op: _count(hlo, op)
        for op in ("all-to-all", "all-gather", "all-reduce",
                   "collective-permute")
    }


def test_dist_ntt_exactly_one_all_to_all():
    field = Field()
    n = 1 << 10
    root = field.primitive_nth_root(n).value
    n1, n2 = _four_step_geometry(n)
    fn = _dist_ntt_call(n1, n2, N_DEV, root)
    xm = jnp.zeros((n1, n2, L.NLIMB), jnp.uint32)
    tw = _dist_twiddle(root, n1, n2)
    pow1 = powers_mont(pow(root, n2, P), max(1, n1 // 2))
    pow2 = powers_mont(pow(root, n1, P), max(1, n2 // 2))
    hlo = fn.lower(xm, tw, pow1, pow2).compile().as_text()
    counts = _collective_counts(hlo)
    assert counts["all-to-all"] == 1, counts
    assert counts["all-gather"] == 0, counts


def test_dist_fold_round_never_all_gathers():
    from zk_stark_tpu.fri import _fold_round_kernel_cached

    field = Field()
    n = 1 << 10
    eng = dist_engine(N_DEV)
    omega = field.primitive_nth_root(n).value
    kern = _fold_round_kernel_cached(n, eng)
    cw = eng.constrain(jnp.zeros((n, L.NLIMB), jnp.uint32))
    invpows = powers_mont(pow(omega, -1, P), n // 2)
    ao = L.int_to_mont(5)
    two_inv = L.int_to_mont(pow(2, -1, P))
    hlo = kern.lower(cw, invpows, ao, two_inv).compile().as_text()
    counts = _collective_counts(hlo)
    assert counts["all-gather"] == 0, counts
    # the lo/hi pairing must be an explicit exchange, not a full gather
    assert (
        counts["collective-permute"] + counts["all-to-all"] >= 1
    ), counts


def test_hybrid_row_engine_collectives_stay_on_ici():
    """VERDICT r4 item 8: pin the hybrid (dcn x ici) collective layout.

    parallel/multihost.py documents the design rule — O(domain) collectives
    (the NTT all_to_all, the fold pairing) must never cross DCN; only host
    bytes do.  ``engine_for_hybrid`` realizes it by building a DistEngine
    over exactly ONE ICI row of the hybrid mesh, so the enforcement is:
    (a) each row engine's device set IS its mesh row (disjoint across
    rows); (b) the dist-NTT compiled for a row engine is partitioned over
    only those devices (num_partitions == row width) and keeps the flat
    invariant (one all-to-all, zero all-gather); (c) executing it yields
    output sharded onto the row's devices alone — no replica group can
    even name a cross-DCN device.
    """
    from zk_stark_tpu.parallel import multihost
    from zk_stark_tpu.parallel.engine import engine_for_hybrid

    mesh = multihost.hybrid_mesh(jax.devices()[:N_DEV], ici_parallelism=4)
    assert mesh.devices.shape == (2, 4)  # 2 DCN rows x 4 ICI devices
    engines = [engine_for_hybrid(mesh, r) for r in range(2)]
    row_sets = [set(mesh.devices[r].tolist()) for r in range(2)]
    assert set(engines[0].devices) == row_sets[0]
    assert set(engines[1].devices) == row_sets[1]
    assert row_sets[0].isdisjoint(row_sets[1])

    field = Field()
    n = 1 << 10
    root = field.primitive_nth_root(n).value
    n1, n2 = _four_step_geometry(n)
    xm = jnp.zeros((n1, n2, L.NLIMB), jnp.uint32)
    tw = _dist_twiddle(root, n1, n2)
    pow1 = powers_mont(pow(root, n2, P), max(1, n1 // 2))
    pow2 = powers_mont(pow(root, n1, P), max(1, n2 // 2))
    for r, eng in enumerate(engines):
        fn = _dist_ntt_call(n1, n2, eng.n_devices, root, eng.devices)
        compiled = fn.lower(xm, tw, pow1, pow2).compile()
        hlo = compiled.as_text()
        counts = _collective_counts(hlo)
        assert counts["all-to-all"] == 1, (r, counts)
        assert counts["all-gather"] == 0, (r, counts)
        # partitioned over the row only: 4 partitions, not the global 8
        assert "num_partitions=4" in hlo.splitlines()[0], hlo.splitlines()[0]
        out = fn(xm, tw, pow1, pow2)
        assert set(out.sharding.device_set) == row_sets[r]
