"""Batched Rescue-Prime permutation on device.

TPU-native counterpart of the reference's scalar permutation loop
(ref: /root/reference/src/rescue_prime/rescue_prime.rs:50-104): the sponge
state is [batch, m, 8] limb arrays and all S-box / MDS / constant steps are
vectorized over the batch (the Merkle-leaf hashing path of BASELINE config 3).

The whole N-round permutation is one jitted ``fori_loop`` so the inverse
S-box's 119-bit exponent chain compiles once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import limbs as L


@functools.lru_cache(maxsize=None)
def _permutation_kernel(
    m: int, n_rounds: int, alpha: int, alpha_inv: int, mds_flat: tuple
):
    alpha_bits = [int(b) for b in bin(alpha)[2:]]

    def pow_alpha(x):
        # alpha is tiny (3): unrolled square-and-multiply
        acc = x
        for b in alpha_bits[1:]:
            acc = L.mont_mul(acc, acc)
            if b:
                acc = L.mont_mul(acc, x)
        return acc

    def pow_alpha_inv(x):
        # ~127-bit static exponent: fixed-window exponentiation (~170 muls
        # instead of 2-per-bit scanned square-and-multiply).
        return L.mont_pow_windowed(x, alpha_inv)

    def kernel(state, mds, round_constants):
        # state [B, m, 8]; mds [m, m, 8]; round_constants [2*N*m, 8]
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
    """
    m = state.shape[1]
    kern = _permutation_kernel(m, n_rounds, alpha, alpha_inv, (m,))
    return kern(state, mds, round_constants)
