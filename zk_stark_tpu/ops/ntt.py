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


def pow_by_exponents(acc, basepows, exps, nbits: int):
    """acc * base^exps elementwise, for an arbitrary uint32 exponent array.

    ``acc``: [..., 8] Montgomery initial values (usually ones, or a scale);
    ``basepows``: [nbits, 8] Montgomery base^(2^k) scalars;
    ``exps``: [...] uint32 exponents (broadcastable against acc's batch dims).
    One multiply body via fori_loop — compile-friendly at any size.
    """

    def body(k, acc):
        bit = (exps >> k) & 1
        factor = jnp.broadcast_to(basepows[k], acc.shape)
        return jnp.where((bit == 1)[..., None], L.mont_mul(acc, factor), acc)

    return jax.lax.fori_loop(0, nbits, body, acc)


def host_base_pows(base_int: int, nbits: int) -> np.ndarray:
    """Montgomery [nbits, 8] HOST array of base^(2^k).

    Stays numpy (callers pass it as a jit argument): materializing it as a
    device array here would cost an eager upload+fetch round trip per
    cached table instance."""
    out, b = [], base_int % L.P
    for _ in range(nbits):
        out.append(b * L.R_INT % L.P)
        b = b * b % L.P
    return L.ints_to_limbs(out)


@functools.lru_cache(maxsize=None)
def _powers_kernel(n: int, nbits: int):
    def kernel(scale_col, basepows):
        # index vector and broadcast built INSIDE the program: the former
        # eager arange/broadcast cost one XLA compile + transport dispatch
        # per op on the remote backend (r5 cold-start profile)
        idx = jax.lax.iota(jnp.uint32, n)
        init = jnp.broadcast_to(scale_col, (n, L.NLIMB))
        return pow_by_exponents(init, basepows, idx, nbits)

    return jax.jit(kernel)


@functools.lru_cache(maxsize=None)
def _powers_mont_cached(base_int: int, n: int, scale_int: int) -> jax.Array:
    if n == 0:
        return jnp.zeros((0, L.NLIMB), dtype=jnp.uint32)
    nbits = max(1, (n - 1).bit_length())
    # ensure_compile_time_eval: this may be reached while tracing (e.g. from
    # inside shard_map bodies); the table must be computed concretely so the
    # lru_cache never captures a tracer.
    with jax.ensure_compile_time_eval():
        out = _powers_kernel(n, nbits)(
            np.asarray(L.int_to_limbs(scale_int * L.R_INT % L.P)),
            host_base_pows(base_int, nbits),
        )
        # re-materialize from host bytes: a table first computed during a
        # shard_map (Manual-mesh) trace otherwise caches a Manual-typed
        # aval that poisons every later jit trace mixing it with
        # Auto-sharded arrays ("Mesh for all inputs should be equal")
        return jax.device_put(np.asarray(out))


def powers_mont(base_int: int, n: int, scale_int: int = 1) -> jax.Array:
    """Device array [n, 8] (Montgomery) of ``scale * base^i`` for i in [0, n).

    Cached per (base, n, scale); inside pooled jits the table is routed as a
    runtime argument (see ops.constpool) instead of an HLO constant.
    """
    from .constpool import intern

    return intern(
        ("powers", base_int, n, scale_int),
        _powers_mont_cached(base_int, n, scale_int),
    )


# -----------------------------------------------------------------------------
# Core transform
# -----------------------------------------------------------------------------


def ntt_body(x, powtable, brev, n: int):
    """Core transform on x: [n, *batch, 8]; returns same shape.

    Traceable (usable inside jit / shard_map); the stage loop is a fori_loop
    with one Montgomery multiply body regardless of n.
    """
    log2n = n.bit_length() - 1
    idx = jnp.arange(n, dtype=jnp.uint32)
    batch_dims = x.ndim - 2
    expand = (slice(None),) + (None,) * (batch_dims + 1)
    wexpand = (slice(None),) + (None,) * batch_dims + (slice(None),)

    x = jnp.take(x, brev, axis=0)

    def stage(s, x):
        half = np.uint32(1) << s
        tablestep = np.uint32(n) >> (s + 1)
        partner = jnp.take(x, (idx ^ half).astype(jnp.int32), axis=0)
        is_even = ((idx & half) == 0)[expand]
        widx = ((idx & (half - 1)) * tablestep).astype(jnp.int32)
        w = jnp.take(powtable, widx, axis=0)[wexpand]
        e = jnp.where(is_even, x, partner)
        o = L.mont_mul(jnp.where(is_even, partner, x), w)
        return jnp.where(is_even, L.add_mod(e, o), L.sub_mod(e, o))

    return jax.lax.fori_loop(0, log2n, stage, x)


def ntt_body_unrolled(x, powtable, brev, n: int):
    """Reshape-based DIT butterflies, stages unrolled at trace time.

    Same math as :func:`ntt_body`, but each stage views the (bit-reversed)
    data as ``[n/(2h), 2, h, *batch]`` so the even/odd halves are contiguous
    slices: no partner gather, no ``where`` selects, and only n/2 Montgomery
    multiplies per stage (the fori_loop form pays a full-n multiply plus three
    selects).  Costs one multiply instance per stage at compile time, so it is
    used for the large four-step tiles (row length <= 2^11 -> <= 11 instances)
    where runtime dominates; small/CPU paths keep the one-instance fori_loop.
    """
    log2n = n.bit_length() - 1
    batch_shape = x.shape[1:-1]
    nb = len(batch_shape)
    x = jnp.take(x, brev, axis=0)
    for s in range(log2n):
        h = 1 << s
        tablestep = n >> (s + 1)
        w = powtable[::tablestep]  # [h, 8]: root^(j * n / 2h)
        xr = x.reshape((n // (2 * h), 2, h) + batch_shape + (L.NLIMB,))
        even, odd = xr[:, 0], xr[:, 1]
        wb = jnp.broadcast_to(
            w.reshape((1, h) + (1,) * nb + (L.NLIMB,)), odd.shape
        )
        t = L.mont_mul(odd, wb)
        out = jnp.stack([L.add_mod(even, t), L.sub_mod(even, t)], axis=1)
        x = out.reshape((n,) + batch_shape + (L.NLIMB,))
    return x


@functools.lru_cache(maxsize=None)
def _ntt_kernel(n: int):
    """Jitted full NTT for size n: x must already be padded to n (pow2)."""
    assert is_pow2(n) and n >= 2
    return jax.jit(lambda x, powtable, brev: ntt_body(x, powtable, brev, n))


#: Above this size the flat transform switches to the four-step (Bailey)
#: decomposition: per-element partner/twiddle gathers on a [n] vector are the
#: dominant cost on TPU (strided single-element rows), while on a [R, C]
#: matrix the same butterflies gather whole contiguous rows and the twiddle
#: lookup collapses to the axis-0 length.  Measured on v5e: flat 2^20 NTT
#: 843 ms vs ~40 ms four-step.
_FOUR_STEP_MIN = 1 << 15


def _twiddle_matrix(root_int: int, r: int, c: int) -> jax.Array:
    from .constpool import intern

    return intern(
        ("twiddle", root_int, r, c), _twiddle_matrix_cached(root_int, r, c)
    )


@functools.lru_cache(maxsize=None)
def _twiddle_kernel(r: int, c: int, nbits: int, planes: bool):
    def kernel(basepows):
        k1 = jax.lax.broadcasted_iota(jnp.uint32, (r, c), 0)
        i2 = jax.lax.broadcasted_iota(jnp.uint32, (r, c), 1)
        ones = jnp.broadcast_to(jnp.asarray(L.ONE_MONT), (r, c, L.NLIMB))
        tw = pow_by_exponents(ones, basepows, k1 * i2, nbits)
        return tw.transpose(2, 0, 1) if planes else tw

    return jax.jit(kernel)


def _twiddle_build(root_int: int, r: int, c: int, planes: bool) -> jax.Array:
    """Montgomery twiddles root^(k1*i2) built as ONE jitted program (no
    eager iota/broadcast/transpose ops): [r, c, 8], or [8, r, c] limb
    planes when ``planes``."""
    with jax.ensure_compile_time_eval():
        nbits = max(1, (r * c - 1).bit_length())
        return _twiddle_kernel(r, c, nbits, planes)(
            host_base_pows(root_int, nbits)
        )


@functools.lru_cache(maxsize=None)
def _twiddle_matrix_cached(root_int: int, r: int, c: int) -> jax.Array:
    """[r, c, 8] Montgomery twiddles root^(k1*i2) (cached)."""
    return _twiddle_build(root_int, r, c, False)


@functools.lru_cache(maxsize=None)
def _four_step_kernel(n: int):
    """Jitted four-step NTT: x [n, 8] natural order -> [n, 8] natural order.

    n = R*C; row NTT (length R, root w^C) + twiddle + transpose + row NTT
    (length C, root w^R).  Output flat index k = k1 + R*k2 equals the
    row-major position, so the result is in natural order.
    """
    logn = n.bit_length() - 1
    r = 1 << ((logn + 1) // 2)
    c = n // r

    def kernel(x, pow_r, brev_r, pow_c, brev_c, tw):
        x2 = x.reshape(r, c, L.NLIMB)
        y = ntt_body_unrolled(x2, pow_r, brev_r, r)  # i1 -> k1 per column
        y = L.mont_mul(y, tw)                        # w^(k1*i2)
        y = jnp.swapaxes(y, 0, 1)                    # [c, r, 8], axis0 = i2
        z = ntt_body_unrolled(y, pow_c, brev_c, c)   # i2 -> k2 per row
        return z.reshape(n, L.NLIMB)

    return jax.jit(kernel), r, c


def _pad_pow2(x: jax.Array) -> jax.Array:
    m = x.shape[0]
    n = next_pow2(m)
    if n == m:
        return x
    pad = jnp.zeros((n - m, L.NLIMB), dtype=jnp.uint32)
    return jnp.concatenate([x, pad], axis=0)


@functools.lru_cache(maxsize=None)
def _brev(n: int) -> jax.Array:
    # ensure_compile_time_eval: may be first reached under tracing; the cache
    # must hold a concrete array, never a lifted tracer constant
    with jax.ensure_compile_time_eval():
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
    if n >= _FOUR_STEP_MIN:
        kernel, r, c = _four_step_kernel(n)
        root_c = pow(root_int, c, L.P)
        root_r = pow(root_int, r, L.P)
        return kernel(
            x,
            powers_mont(root_c, r // 2),
            _brev(r),
            powers_mont(root_r, c // 2),
            _brev(c),
            _twiddle_matrix(root_int, r, c),
        )
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
