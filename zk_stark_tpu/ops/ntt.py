"""Device radix-2 NTT / iNTT over GF(p) limb arrays.

TPU-native replacement for the reference iterative NTT
(ref: /root/reference/src/fft/ntt.rs:7-68).  Same math — bit-reverse copy then
log2(n) Cooley-Tukey butterfly stages against a precomputed power table — but
executed as vectorized limb arithmetic:

* The whole transform is one jitted function per size; the stage loop is a
  ``lax.fori_loop`` whose body does the butterflies for *all* n positions at
  once (gather partner, multiply odd lane by twiddle, add/sub).  One Montgomery
  multiply instance per size keeps XLA compile time flat.
* Twiddle power tables are computed on device by binary-weighted products of
  host-precomputed ``root^(2^k)`` scalars (log n full-array multiplies).

Values are Montgomery-form uint32[..., 8] (see zk_stark_tpu.ops.limbs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.bits import bit_reverse_indices, is_pow2, next_pow2
from . import limbs as L


# -----------------------------------------------------------------------------
# Device power series
# -----------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _powers_kernel(n: int, nbits: int):
    idx = jnp.arange(n, dtype=jnp.uint32)

    def kernel(acc, basepows):
        def body(k, acc):
            bit = (idx >> k) & 1
            factor = jnp.broadcast_to(basepows[k], acc.shape)
            return jnp.where((bit == 1)[:, None], L.mont_mul(acc, factor), acc)

        return jax.lax.fori_loop(0, nbits, body, acc)

    return jax.jit(kernel)


@functools.lru_cache(maxsize=None)
def powers_mont(base_int: int, n: int, scale_int: int = 1) -> jax.Array:
    """Device array [n, 8] (Montgomery) of ``scale * base^i`` for i in [0, n).

    Cached per (base, n, scale).  base^(2^k) scalars are computed on host.
    """
    if n == 0:
        return jnp.zeros((0, L.NLIMB), dtype=jnp.uint32)
    nbits = max(1, (n - 1).bit_length())
    basepows = []
    b = base_int % L.P
    for _ in range(nbits):
        basepows.append(b)
        b = b * b % L.P
    basepows_dev = L.ints_to_mont(basepows)
    init = jnp.broadcast_to(L.int_to_mont(scale_int), (n, L.NLIMB))
    return _powers_kernel(n, nbits)(init, basepows_dev)


# -----------------------------------------------------------------------------
# Core transform
# -----------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _ntt_kernel(n: int):
    """Jitted full NTT for size n: x must already be padded to n (pow2)."""
    assert is_pow2(n) and n >= 2
    log2n = n.bit_length() - 1
    idx = jnp.arange(n, dtype=jnp.uint32)

    def kernel(x, powtable, brev):
        x = jnp.take(x, brev, axis=0)

        def stage(s, x):
            half = jnp.uint32(1) << s
            tablestep = jnp.uint32(n) >> (s + 1)
            partner = jnp.take(x, (idx ^ half).astype(jnp.int32), axis=0)
            is_even = ((idx & half) == 0)[:, None]
            widx = ((idx & (half - 1)) * tablestep).astype(jnp.int32)
            w = jnp.take(powtable, widx, axis=0)
            e = jnp.where(is_even, x, partner)
            o = L.mont_mul(jnp.where(is_even, partner, x), w)
            return jnp.where(is_even, L.add_mod(e, o), L.sub_mod(e, o))

        return jax.lax.fori_loop(0, log2n, stage, x)

    return jax.jit(kernel)


def _pad_pow2(x: jax.Array) -> jax.Array:
    m = x.shape[0]
    n = next_pow2(m)
    if n == m:
        return x
    pad = jnp.zeros((n - m, L.NLIMB), dtype=jnp.uint32)
    return jnp.concatenate([x, pad], axis=0)


@functools.lru_cache(maxsize=None)
def _brev(n: int) -> jax.Array:
    return jnp.asarray(bit_reverse_indices(n))


def ntt_mont(x: jax.Array, root_int: int) -> jax.Array:
    """Forward NTT of Montgomery values; pads to next power of two.

    ``root_int`` must be a primitive n-th root of unity for the padded size
    (matching the reference contract, ref: fft/ntt.rs:7-49).
    """
    x = _pad_pow2(jnp.asarray(x))
    n = x.shape[0]
    if n < 2:
        return x
    powtable = powers_mont(root_int, n // 2)
    return _ntt_kernel(n)(x, powtable, _brev(n))


@functools.lru_cache(maxsize=None)
def _scale_kernel():
    return jax.jit(
        lambda x, s: L.mont_mul(x, jnp.broadcast_to(s, x.shape))
    )


def scalar_mul_mont(x: jax.Array, scalar_int: int) -> jax.Array:
    """Multiply every element by a host scalar."""
    return _scale_kernel()(jnp.asarray(x), L.int_to_mont(scalar_int))


def intt_mont(x: jax.Array, root_int: int) -> jax.Array:
    """Inverse NTT: ntt with root^-1, scaled by n^-1
    (ref: fft/ntt.rs:51-68; returns input unchanged when len < 2)."""
    x = jnp.asarray(x)
    if x.shape[0] < 2:
        return x
    n = next_pow2(x.shape[0])
    root_inv = pow(root_int, -1, L.P)
    n_inv = pow(n, -1, L.P)
    y = ntt_mont(x, root_inv)
    return scalar_mul_mont(y, n_inv)


# -----------------------------------------------------------------------------
# Convenience: elementwise product of two equal-length Montgomery arrays
# -----------------------------------------------------------------------------

hadamard = L.mont_mul_jit
