"""Batched Rescue-Prime permutation on device.

TPU-native counterpart of the reference's scalar permutation loop
(ref: /root/reference/src/rescue_prime/rescue_prime.rs:50-104): the sponge
state is [batch, m, 8] limb arrays and all S-box / MDS / constant steps are
vectorized over the batch (the Merkle-leaf hashing path of BASELINE config 3).

The whole N-round permutation is one jitted ``fori_loop`` so the inverse
S-box's 119-bit exponent chain compiles once.

Layout (round 4): the batch is carried as limb-PLANE arrays
``[m, 8, rows, 128]`` — each (register, limb) slice is a [rows, 128]
matrix that tiles exactly onto the VPU's 8x128 vectors.  The former
``[B, m, 8]`` layout put the 8 limbs on the minor axis, which TPU tiling
pads to 128 lanes (~4x measured throughput loss; the same fix as the
Pallas NTT/fold/Merkle kernels, here achieved in plain XLA because the
round chain fuses fully anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import limbs as L
from .ntt_pallas import add_mod_planes, mont_mul_planes


def _stack(planes):
    return jnp.stack(planes)


def _unstack(arr):
    return [arr[k] for k in range(L.NLIMB)]


def _planes_pow_windowed(x, e: int, window: int = 4, unroll: bool = False):
    """x^e on stacked planes [8, rows, 128] (static e), fixed-window form —
    the plane-layout counterpart of limbs.mont_pow_windowed.

    Two trace shapes: the compact scan/table form (one multiply instance,
    the XLA-CPU-compilable default) and, with ``unroll``, a fully static
    unroll — digits of a static exponent are known at trace time, so the
    table select is Python indexing and the squaring chain carries no
    scan/dynamic-slice scaffolding between multiplies (the scan form's
    per-digit dynamic_index of the [16, 8, r, 128] table measured as the
    gap between the Rescue batch's 41.7% SoL and the bare multiply chain).
    """
    one_col = jnp.asarray(L.ONE_MONT)  # [8]
    one = jnp.broadcast_to(
        one_col.reshape((L.NLIMB,) + (1,) * (x.ndim - 1)), x.shape
    ).astype(jnp.uint32)
    if e == 0:
        return one
    bits = e.bit_length()
    mask = (1 << window) - 1
    ndig = -(-bits // window)
    digits = [(e >> (window * (ndig - 1 - i))) & mask for i in range(ndig)]

    def mulp(a, b):
        return _stack(mont_mul_planes(_unstack(a), _unstack(b)))

    if unroll:
        # static table: powers x^1..x^15 (x^0 never selected mid-chain for
        # this exponent family, but keep it for generality)
        table = [one, x]
        for _ in range(2, mask + 1):
            table.append(mulp(table[-1], x))
        acc = table[digits[0]]
        for d in digits[1:]:
            for _ in range(window):
                acc = mulp(acc, acc)
            if d:
                acc = mulp(acc, table[d])
        return acc

    def tbody(acc, _):
        nxt = mulp(acc, x)
        return nxt, nxt

    _, tail = jax.lax.scan(tbody, one, None, length=mask)
    table = jnp.concatenate([one[None], tail], axis=0)  # [16, 8, r, 128]

    acc = table[digits[0]]
    if ndig == 1:
        return acc
    dig_arr = jnp.asarray(digits[1:], dtype=jnp.uint32)

    def body(acc, d):
        acc = jax.lax.fori_loop(0, window, lambda i, a: mulp(a, a), acc)
        sel = jax.lax.dynamic_index_in_dim(table, d, 0, keepdims=False)
        return mulp(acc, sel), None

    acc, _ = jax.lax.scan(body, acc, dig_arr)
    return acc


@functools.lru_cache(maxsize=None)
def _permutation_kernel_cols(
    m: int, n_rounds: int, alpha: int, alpha_inv: int, mds_flat: tuple
):
    """[B, m, 8]-layout permutation (the CPU-backend kernel).

    XLA-CPU compiles this form in ~a minute but takes tens of minutes on
    the plane form's scan/table structure, so the plane kernel is
    TPU-only; parity between the two is asserted on hardware by
    bench.bench_rescue_batch against host hashes.
    """
    alpha_bits = [int(b) for b in bin(alpha)[2:]]

    def pow_alpha(x):
        acc = x
        for b in alpha_bits[1:]:
            acc = L.mont_mul(acc, acc)
            if b:
                acc = L.mont_mul(acc, x)
        return acc

    def pow_alpha_inv(x):
        return L.mont_pow_windowed(x, alpha_inv)

    def kernel(state, mds, round_constants):
        def mds_mul(s):
            out = []
            for j in range(m):
                acc = L.mont_mul(
                    jnp.broadcast_to(mds[j, 0], s[:, 0].shape), s[:, 0]
                )
                for i in range(1, m):
                    acc = L.add_mod(
                        acc,
                        L.mont_mul(
                            jnp.broadcast_to(mds[j, i], s[:, i].shape),
                            s[:, i],
                        ),
                    )
                out.append(acc)
            return jnp.stack(out, axis=1)

        def round_fn(r, s):
            s = pow_alpha(s)
            s = mds_mul(s)
            c1 = jax.lax.dynamic_slice_in_dim(
                round_constants, 2 * r * m, m, axis=0
            )
            s = L.add_mod(s, jnp.broadcast_to(c1[None], s.shape))
            s = pow_alpha_inv(s)
            s = mds_mul(s)
            c2 = jax.lax.dynamic_slice_in_dim(
                round_constants, 2 * r * m + m, m, axis=0
            )
            s = L.add_mod(s, jnp.broadcast_to(c2[None], s.shape))
            return s

        return jax.lax.fori_loop(0, n_rounds, round_fn, state)

    return jax.jit(kernel)


@functools.lru_cache(maxsize=None)
def _permutation_kernel(
    m: int, n_rounds: int, alpha: int, alpha_inv: int, mds_flat: tuple,
    unroll_pow: bool = True,
):
    alpha_bits = [int(b) for b in bin(alpha)[2:]]

    def mulp(a, b):
        return _stack(mont_mul_planes(_unstack(a), _unstack(b)))

    def addp(a, b):
        return _stack(add_mod_planes(_unstack(a), _unstack(b)))

    def pow_alpha(x):
        # alpha is tiny (3): unrolled square-and-multiply
        acc = x
        for b in alpha_bits[1:]:
            acc = mulp(acc, acc)
            if b:
                acc = mulp(acc, x)
        return acc

    def kernel(state, mds, round_constants):
        # state [B, m, 8]; mds [m, m, 8]; round_constants [2*N*m, 8].
        # Planes are [8, m*rows, 128] with register j occupying row block
        # [j*rows, (j+1)*rows): all m registers ride inside every vector op
        # (the S-box chains are ~180 *dependent* multiplies, so op width —
        # not just op count — sets the latency floor), and every array in
        # the pow scans stays a plain 2-D-tiled plane.
        B = state.shape[0]
        rows = B // 128
        s = jnp.transpose(state, (2, 1, 0)).reshape(
            L.NLIMB, m * rows, 128
        )

        def bc(cols):
            # per-register limb vectors [m, 8] -> [8, m*rows, 128]
            return jnp.broadcast_to(
                jnp.transpose(cols)[:, :, None, None],
                (L.NLIMB, m, rows, 128),
            ).astype(jnp.uint32).reshape(L.NLIMB, m * rows, 128)

        def reg(s, j):
            return s[:, j * rows : (j + 1) * rows]

        def bcs(col):  # one scalar limb vector [8] -> [8, rows, 128]
            return jnp.broadcast_to(
                col[:, None, None], (L.NLIMB, rows, 128)
            ).astype(jnp.uint32)

        def mds_mul(s):
            out = []
            for j in range(m):
                acc = mulp(bcs(mds[j, 0]), reg(s, 0))
                for i in range(1, m):
                    acc = addp(acc, mulp(bcs(mds[j, i]), reg(s, i)))
                out.append(acc)
            return jnp.concatenate(out, axis=1)

        def round_fn(r, s):
            s = pow_alpha(s)
            s = mds_mul(s)
            c1 = jax.lax.dynamic_slice_in_dim(
                round_constants, 2 * r * m, m, axis=0
            )
            s = addp(s, bc(c1))
            s = _planes_pow_windowed(s, alpha_inv, unroll=unroll_pow)
            s = mds_mul(s)
            c2 = jax.lax.dynamic_slice_in_dim(
                round_constants, 2 * r * m + m, m, axis=0
            )
            s = addp(s, bc(c2))
            return s

        s = jax.lax.fori_loop(0, n_rounds, round_fn, s)
        # planes [8, m*rows, 128] -> [B, m, 8]
        return jnp.transpose(s.reshape(L.NLIMB, m, B), (2, 1, 0))

    return jax.jit(kernel)


def permutation_batch(
    state: jax.Array,
    mds: jax.Array,
    round_constants: jax.Array,
    n_rounds: int,
    alpha: int,
    alpha_inv: int,
) -> jax.Array:
    """Run the full Rescue-XLIX permutation on a batch of states.

    state: [B, m, 8] Montgomery; mds: [m, m, 8]; round_constants [2*N*m, 8].
    Batches that are not a multiple of 128 (the VPU lane width the plane
    layout needs) are padded and sliced back.
    """
    import os

    m = state.shape[1]
    # ZK_STARK_TPU_RESCUE_COLS=1 forces the column kernel for A/B on TPU;
    # =0 (or unset) leaves the backend default (same 0/1 convention as
    # ZK_STARK_TPU_DEVICE_MERKLE)
    if (
        jax.default_backend() == "cpu"
        or os.environ.get("ZK_STARK_TPU_RESCUE_COLS") == "1"
    ):
        kern = _permutation_kernel_cols(m, n_rounds, alpha, alpha_inv, (m,))
        return kern(state, mds, round_constants)
    return _permutation_batch_planes(
        state, mds, round_constants, n_rounds, alpha, alpha_inv
    )


def _permutation_batch_planes(
    state, mds, round_constants, n_rounds, alpha, alpha_inv
):
    """Plane-layout permutation incl. the pad-to-128/slice-back path.

    Split out of :func:`permutation_batch` so CPU parity tests can drive
    the TPU kernel (in whatever backend is active) without the
    backend-dispatch guard (tests/test_rescue.py)."""
    m = state.shape[1]
    B = state.shape[0]
    pad = (-B) % 128
    if pad:
        state = jnp.concatenate(
            [state, jnp.zeros((pad, m, L.NLIMB), jnp.uint32)], axis=0
        )
    # The statically-unrolled inverse-S-box chain (unroll_pow=True) was
    # measured on hardware at 21.5 ms for the 2^14 batch vs 21.7 ms for the
    # scan/table form — the chain is LATENCY-bound on its ~150 dependent
    # multiplies, not on scan/dynamic-slice scaffolding — so the compact
    # scan form (one multiply instance, XLA-CPU-compilable) stays default.
    kern = _permutation_kernel(
        m, n_rounds, alpha, alpha_inv, (m,), False
    )
    out = kern(state, mds, round_constants)
    return out[:B] if pad else out
