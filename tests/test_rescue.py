"""Rescue-Prime golden vectors (ref: rescue_prime.rs:297-421)."""

import random

from zk_stark_tpu.field import Field
from zk_stark_tpu.models.rescue_prime import RescuePrime

F = Field()
RP = RescuePrime(F, 2, 1, 128, 27)

HASH_A = 57322816861100832358702415967512842988
HASH_B = 89633745865384635541695204788332415101


def test_constants():
    assert RP.alpha == 3
    assert RP.alpha_inv == 180331931428153586757283157844700080811
    assert RP.MDS == [
        [270497897142230380135924736767050121214, 4],
        [270497897142230380135924736767050121205, 13],
    ]
    assert RP.MDS_inv == [
        [
            210387253332845851216830350818816760948,
            60110643809384528919094385948233360270,
        ],
        [
            90165965714076793378641578922350040407,
            180331931428153586757283157844700080811,
        ],
    ]
    assert len(RP.round_constants) == 108
    assert RP.round_constants[0] == 174420698556543096520990950387834928928
    assert RP.round_constants[1] == 109797589356993153279775383318666383471
    assert RP.round_constants[-1] == 18450316039330448878816627264054416127


def test_hash_vector():
    assert RP.hash(1) == 244180265933090377212304188905974087294
    assert RP.hash(HASH_A) == HASH_B


def test_trace():
    trace = RP.trace(HASH_A)
    assert len(trace) == RP.N + 1
    assert trace[0][0] == HASH_A and trace[0][1] == 0
    assert trace[-1][0] == HASH_B


def test_batch_hash_device():
    inputs = [1, HASH_A, 12345, 0]
    got = RP.hash_batch(inputs)
    assert got == [RP.hash(v) for v in inputs]


def test_transition_constraints_hold_on_trace():
    # (ref: rescue_prime.rs:345-421) — constraints vanish on consecutive
    # trace rows, and a perturbed cell violates them.
    n = 1 << 7
    omicron = F.primitive_nth_root(n).value
    constraints = RP.transition_constraints(omicron, n)
    trace = RP.trace(HASH_A)

    def check(trace):
        for cycle, register, value in RP.boundary_constraints(HASH_B):
            if trace[cycle][register] != value:
                return "boundary"
        for i in range(len(trace) - 1):
            point = (
                [pow(omicron, i, F.order)] + list(trace[i]) + list(trace[i + 1])
            )
            for poly in constraints:
                if poly.evaluate(point) != 0:
                    return "transition"
        return "ok"

    assert check(trace) == "ok"

    # fixed regression triple from the reference (rescue_prime.rs:398)
    trace[22][1] = (
        trace[22][1] + 17274817952119230544216945715808633996
    ) % F.order
    assert check(trace) != "ok"
    trace[22][1] = (
        trace[22][1] - 17274817952119230544216945715808633996
    ) % F.order

    random.seed(5)
    for _ in range(3):
        cycle = random.randrange(RP.N + 1)
        register = random.randrange(RP.m)
        value = F.sample(random.randbytes(17)).value
        if value == 0:
            continue
        trace[cycle][register] = (trace[cycle][register] + value) % F.order
        assert check(trace) != "ok", (cycle, register, value)
        trace[cycle][register] = (trace[cycle][register] - value) % F.order


def test_plane_kernel_parity_with_cols():
    """The TPU plane-layout permutation matches the column kernel bit-for-bit
    (ADVICE r4: the plane kernel feeds Merkle-leaf hashing, i.e. protocol
    bytes, but had no CPU parity coverage).  Runs 2 of the 27 rounds with the
    real constants — every layout step (transpose, register blocking, MDS,
    both S-box chains, and the non-multiple-of-128 pad/slice path) is
    exercised; the round count only changes how often they repeat.
    """
    import jax.numpy as jnp

    from zk_stark_tpu.ops import limbs as L
    from zk_stark_tpu.ops import rescue_ops as R

    rounds = 2
    random.seed(3)
    B = 130  # NOT a multiple of 128: covers the pad-to-lane-width path
    state = L.ints_to_mont(
        [random.randrange(F.order) for _ in range(B * RP.m)]
    ).reshape(B, RP.m, 8)
    mds = L.ints_to_mont([v for row in RP.MDS for v in row]).reshape(
        RP.m, RP.m, 8
    )
    rc = L.ints_to_mont(RP.round_constants)

    cols = R._permutation_kernel_cols(
        RP.m, rounds, RP.alpha, RP.alpha_inv, (RP.m,)
    )(state, mds, rc)
    planes = R._permutation_batch_planes(
        state, mds, rc, rounds, RP.alpha, RP.alpha_inv
    )
    assert planes.shape == (B, RP.m, 8)
    assert bool(jnp.all(cols == planes))
