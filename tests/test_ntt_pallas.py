"""Parity of the fused-stage Pallas NTT against the jnp path.

Runs the Pallas kernels in interpreter mode so the CPU suite covers the
butterfly/twiddle logic; the compiled-Mosaic path is exercised on real TPU by
bench.py (which cross-checks against ntt_mont before timing).
"""

import random

from zk_stark_tpu.field import Field, FIELD_PRIME
from zk_stark_tpu.ops import limbs as L
from zk_stark_tpu.ops import ntt as N
from zk_stark_tpu.ops import ntt_pallas as NP

F = Field()


def test_pallas_four_step_matches_jnp_interpret():
    # subprocess, single-device: see tests/test_pallas_kernels.py docstring
    from interp_checks import run_check_subprocess

    run_check_subprocess("ntt")


def test_stage_twiddle_table_values():
    n = 16
    root = F.primitive_nth_root(n).value
    tbl = NP._stage_twiddle_table(root, n)
    # stage s entry j must be root^(j * n / 2^(s+1)) in Montgomery form
    for s in range(4):
        h = 1 << s
        step = n >> (s + 1)
        for j in range(h):
            want = pow(root, j * step, L.P) * L.R_INT % L.P
            got = 0
            for k in reversed(range(L.NLIMB)):
                got = (got << L.LIMB_BITS) | int(tbl[k, s, j])
            assert got == want


def test_pease_constant_geometry_matches_inplace():
    """The constant-geometry dataflow (adjacent pairs -> split halves with
    twiddle exponent (i >> (L-1-s)) << (L-1-s)) equals the in-place DIT on
    host ints, with identity output permutation."""
    random.seed(5)
    n = 32
    log2n = 5
    p = FIELD_PRIME
    root = F.primitive_nth_root(n).value
    vals = [random.randrange(p) for _ in range(n)]
    want = list(L.mont_to_ints(N.ntt_mont(L.ints_to_mont(vals), root)))

    from zk_stark_tpu.utils.bits import bit_reverse_indices

    x = [vals[j] for j in bit_reverse_indices(n)]
    for s in range(log2n):
        t = log2n - 1 - s
        y = [0] * n
        for i in range(n // 2):
            tw = pow(root, (i >> t) << t, p)
            a, b = x[2 * i], x[2 * i + 1]
            y[i] = (a + tw * b) % p
            y[i + n // 2] = (a - tw * b) % p
        x = y
    assert x == want
