"""Distributed FRI fold over sharded codewords.

In the transposed evaluation layout produced by parallel.ntt_dist
(matrix [n2, n1, 8], flat index k = k1 + n1*k2, columns k1 sharded), the FRI
pairing k <-> k + N/2 differs only in k2 (row k2 + n2/2, same column), so the
entire split-and-fold round is chip-local — zero communication.  Folding
halves n2; rounds remain local until the codeword is gathered for the final
FRI rounds (which are tiny).

fold(cw)[k] = 1/2 * ((1 + a/(o*w^k)) * cw[k] + (1 - a/(o*w^k)) * cw[k + N/2])
            = 1/2 * ((L + R) + f_k * (L - R)),   f_k = (a/o) * w^-k
(ref: /root/reference/src/fri.rs:151-159)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import limbs as L
from ..ops.ntt import host_base_pows, pow_by_exponents
from . import mesh as mesh_lib
from .mesh import AXIS

P = L.P


@functools.lru_cache(maxsize=None)
def _fold_fn(n1: int, n2: int, n_dev: int, omega_inv: int):
    mesh = mesh_lib.make_mesh(n_dev)
    spec = jax.sharding.PartitionSpec(None, AXIS, None)
    scalar_spec = jax.sharding.PartitionSpec()

    def fn(z, alpha_offset_inv_mont):
        def body(z_local, ao):
            # ao is the Montgomery scalar alpha/offset, replicated
            d = jax.lax.axis_index(AXIS)
            n1_local = n1 // n_dev
            half = n2 // 2
            lo, hi = z_local[:half], z_local[half:]
            s = L.add_mod(lo, hi)
            diff = L.sub_mod(lo, hi)
            k2 = jnp.arange(half, dtype=jnp.uint32)[:, None]
            k1 = (
                jnp.arange(n1_local, dtype=jnp.uint32)[None, :]
                + d.astype(jnp.uint32) * n1_local
            )
            exps = k1 + jnp.uint32(n1) * k2
            nbits = max(1, (n1 * n2 - 1).bit_length())
            basepows = host_base_pows(omega_inv, nbits)
            init = jnp.broadcast_to(ao, s.shape)
            f = pow_by_exponents(init, basepows, exps, nbits)
            two_inv = jnp.broadcast_to(
                L.int_to_mont(pow(2, -1, P)), s.shape
            )
            return L.mont_mul(two_inv, L.add_mod(s, L.mont_mul(f, diff)))

        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(spec, scalar_spec),
            out_specs=spec,
            check_vma=False,
        )(z, alpha_offset_inv_mont)

    return jax.jit(fn), mesh


def fold_dist(
    z: jax.Array, alpha: int, offset: int, omega: int, n_dev: int
) -> jax.Array:
    """One FRI fold on a sharded transposed-layout codeword [n2, n1, 8].

    Returns [n2/2, n1, 8] in the same layout/sharding.  alpha/offset/omega
    are the current round's host scalars (omega is the N-th root for the
    codeword *before* folding).
    """
    n2, n1 = z.shape[0], z.shape[1]
    fn, mesh = _fold_fn(n1, n2, n_dev, pow(omega, -1, P))
    ao = L.int_to_mont(alpha * pow(offset, -1, P) % P)
    return fn(z, ao)
