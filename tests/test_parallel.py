"""Multi-chip sharding logic on a virtual 8-device CPU mesh.

This is the "fake backend" layer the reference never needed (SURVEY §4):
shard_map + collectives validated without TPU hardware.
"""

import random

import jax
import pytest

from zk_stark_tpu.field import Field, FIELD_PRIME as P
from zk_stark_tpu.ops import limbs as L
from zk_stark_tpu.ops.ntt import intt_mont, ntt_mont
from zk_stark_tpu.parallel import fri_dist, ntt_dist

F = Field()

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_dist_ntt_matches_single_device():
    random.seed(1)
    n1, n2 = 32, 16
    n = n1 * n2
    root = F.primitive_nth_root(n).value
    vals = [random.randrange(P) for _ in range(n)]
    x = L.ints_to_mont(vals).reshape(n1, n2, 8)

    z = ntt_dist.ntt_dist(x, root, 8)
    got = list(L.mont_to_ints(ntt_dist.flatten_natural(z)))
    want = list(L.mont_to_ints(ntt_mont(L.ints_to_mont(vals), root)))
    assert got == want

    back = ntt_dist.intt_dist(z, root, 8)
    assert list(L.mont_to_ints(ntt_dist.flatten_natural(back))) == vals


def test_dist_fold_matches_reference_formula():
    random.seed(2)
    n1, n2 = 16, 16
    n = n1 * n2
    omega = F.primitive_nth_root(n).value
    offset = F.generator().value
    alpha = 1234567890123456789

    vals = [random.randrange(P) for _ in range(n)]
    # build the sharded transposed layout: z[k2, k1] = cw[k1 + n1*k2]
    z = L.ints_to_mont(vals).reshape(n2, n1, 8)

    folded = fri_dist.fold_dist(z, alpha, offset, omega, 8)
    got = list(L.mont_to_ints(ntt_dist.flatten_natural(folded)))

    two_inv = pow(2, -1, P)
    want = []
    for i in range(n // 2):
        abo = alpha * pow(offset * pow(omega, i, P) % P, -1, P) % P
        first = (1 + abo) * vals[i]
        second = (1 - abo) * vals[n // 2 + i]
        want.append(two_inv * (first + second) % P)
    assert got == want


def test_dist_fold_matches_single_device_fri():
    from zk_stark_tpu.fri import FRI

    random.seed(3)
    n1, n2 = 16, 8
    n = n1 * n2
    omega = F.primitive_nth_root(n).value
    offset = F.generator().value
    alpha = 987654321

    vals = [random.randrange(P) for _ in range(n)]
    fri = FRI(F, offset, omega, n, 4, 2)
    single = fri._fold(L.ints_to_mont(vals), alpha, offset, omega)
    want = list(L.mont_to_ints(single))

    z = L.ints_to_mont(vals).reshape(n2, n1, 8)
    folded = fri_dist.fold_dist(z, alpha, offset, omega, 8)
    got = list(L.mont_to_ints(ntt_dist.flatten_natural(folded)))
    assert got == want
