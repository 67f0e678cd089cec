"""On-device batched BLAKE2b-512 for Merkle hashing.

TPU-native replacement for the host hashing loop in Merkle commitment
(ref: /root/reference/src/merkle_root.rs:21-32 + crypto/blake2b512.rs:4-14).
Byte parity is mandatory: leaves hash the *decimal-string* encoding of the
field element (ref: field_element.rs:46-50); inner nodes hash the 128-byte
concatenation of two digests.

Both message classes fit a single BLAKE2b compression block (decimal string
of a < 2^128 value is <= 39 bytes; two digests are exactly 128 bytes), so the
whole primitive is one compression function, vectorized elementwise over the
batch on the VPU:

* 64-bit words are (hi, lo) pairs of uint32 arrays — adds carry via an
  unsigned compare, rotations are shift/or pairs;
* the 12 rounds run under ``lax.fori_loop`` with the SIGMA schedule applied
  via dynamic indexing into the stacked [16, ...] message words, keeping the
  compiled program small (CLAUDE.md: never unrolled chains);
* decimal encoding runs on device: 39 short-division-by-10 steps under
  ``lax.scan`` over the 8x16-bit canonical limbs, then a take_along_axis
  shift left-aligns the significant digits into the message block.

Digests stay on device as [..., 8] (hi, lo) word arrays between tree levels —
an inner node's message words are exactly its children's digest words, so
level reduction needs no byte shuffling at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import LIMB_BITS, MASK, NLIMB

# BLAKE2b IV (RFC 7693 §2.6).
_IV = (
    0x6A09E667F3BCC908, 0xBB67AE8584CAA73B,
    0x3C6EF372FE94F82B, 0xA54FF53A5F1D36F1,
    0x510E527FADE682D1, 0x9B05688C2B3E6C1F,
    0x1F83D9ABFB41BD6B, 0x5BE0CD19137E2179,
)
# Parameter block word 0 for digest_size=64, no key: 0x01010000 ^ 64.
_H0 = _IV[0] ^ 0x01010040

# Message schedule (RFC 7693 §2.7); rounds 10, 11 reuse rows 0, 1.
_SIGMA = np.array(
    [
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
        [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
        [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
        [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
        [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
        [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
        [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
        [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
        [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
        [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
        [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    ],
    dtype=np.int32,
)

# The G mixing pattern per round: 8 calls on (a, b, c, d) state rows.
_G_ROWS = (
    (0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15),
    (0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14),
)


def _hi(x: int) -> np.uint32:
    return np.uint32(x >> 32)


def _lo(x: int) -> np.uint32:
    return np.uint32(x & 0xFFFFFFFF)


def _add64(ah, al, bh, bl):
    lo = al + bl
    carry = (lo < al).astype(jnp.uint32)
    return ah + bh + carry, lo


def _ror64(h, l, r: int):
    if r == 32:
        return l, h
    if r < 32:
        s = jnp.uint32(r)
        t = jnp.uint32(32 - r)
        return (h >> s) | (l << t), (l >> s) | (h << t)
    # r == 63 is rotl by 1
    assert r == 63
    return (h << 1) | (l >> 31), (l << 1) | (h >> 31)


def _compress(mhi, mlo, t_hi, t_lo):
    """One final-block BLAKE2b-512 compression, batched over trailing dims.

    ``mhi``/``mlo``: uint32 [16, ...] message words; ``t_hi``/``t_lo``:
    uint32 byte-count scalars or [...]-shaped arrays.  Returns digest words
    (hhi, hlo) of shape [8, ...].
    """
    shape = mhi.shape[1:]

    def bc(x):
        return jnp.broadcast_to(jnp.uint32(x), shape)

    vhi = [bc(_H0 >> 32)] + [bc(_hi(_IV[i])) for i in range(1, 8)] + [
        bc(_hi(_IV[i])) for i in range(8)
    ]
    vlo = [bc(_H0 & 0xFFFFFFFF)] + [bc(_lo(_IV[i])) for i in range(1, 8)] + [
        bc(_lo(_IV[i])) for i in range(8)
    ]
    # v12 ^= t (message byte count); v14 ^= -1 (final block flag)
    vhi[12] = vhi[12] ^ jnp.broadcast_to(jnp.asarray(t_hi, jnp.uint32), shape)
    vlo[12] = vlo[12] ^ jnp.broadcast_to(jnp.asarray(t_lo, jnp.uint32), shape)
    vhi[14] = vhi[14] ^ jnp.uint32(0xFFFFFFFF)
    vlo[14] = vlo[14] ^ jnp.uint32(0xFFFFFFFF)

    vhi = jnp.stack(vhi)
    vlo = jnp.stack(vlo)
    sigma = jnp.asarray(_SIGMA)

    def round_body(r, state):
        vhi, vlo = state
        srow = jax.lax.dynamic_index_in_dim(sigma, r, axis=0, keepdims=False)

        def g(vhi, vlo, rows, xi, yi):
            a, b, c, d = rows
            xh = jax.lax.dynamic_index_in_dim(mhi, xi, 0, keepdims=False)
            xl = jax.lax.dynamic_index_in_dim(mlo, xi, 0, keepdims=False)
            yh = jax.lax.dynamic_index_in_dim(mhi, yi, 0, keepdims=False)
            yl = jax.lax.dynamic_index_in_dim(mlo, yi, 0, keepdims=False)
            ah, al = _add64(vhi[a], vlo[a], vhi[b], vlo[b])
            ah, al = _add64(ah, al, xh, xl)
            dh, dl = _ror64(vhi[d] ^ ah, vlo[d] ^ al, 32)
            ch, cl = _add64(vhi[c], vlo[c], dh, dl)
            bh, bl = _ror64(vhi[b] ^ ch, vlo[b] ^ cl, 24)
            ah, al = _add64(ah, al, bh, bl)
            ah, al = _add64(ah, al, yh, yl)
            dh, dl = _ror64(dh ^ ah, dl ^ al, 16)
            ch, cl = _add64(ch, cl, dh, dl)
            bh, bl = _ror64(bh ^ ch, bl ^ cl, 63)
            vhi = vhi.at[a].set(ah).at[b].set(bh).at[c].set(ch).at[d].set(dh)
            vlo = vlo.at[a].set(al).at[b].set(bl).at[c].set(cl).at[d].set(dl)
            return vhi, vlo

        for i, rows in enumerate(_G_ROWS):
            vhi, vlo = g(vhi, vlo, rows, srow[2 * i], srow[2 * i + 1])
        return vhi, vlo

    vhi, vlo = jax.lax.fori_loop(0, 12, round_body, (vhi, vlo))

    hhi, hlo = [], []
    for i in range(8):
        iv = _H0 if i == 0 else _IV[i]
        hhi.append(jnp.uint32(_hi(iv)) ^ vhi[i] ^ vhi[i + 8])
        hlo.append(jnp.uint32(_lo(iv)) ^ vlo[i] ^ vlo[i + 8])
    return jnp.stack(hhi), jnp.stack(hlo)


# -----------------------------------------------------------------------------
# Leaf hashing: decimal-string encoding + single-block compression
# -----------------------------------------------------------------------------

#: max decimal digits of a value < 2^128
_MAX_DIGITS = 39


def _decimal_digits(limbs):
    """Canonical uint32[n, 8] limbs -> right-aligned digit matrix [n, 39].

    Column 38 holds the units digit; leading columns are zero for small
    values.  39 scan steps of short division by 10 over the 16-bit limbs.
    """

    def step(carry_limbs, _):
        rem = jnp.zeros_like(carry_limbs[:, 0])
        new = []
        for k in reversed(range(NLIMB)):
            cur = (rem << LIMB_BITS) | carry_limbs[:, k]
            q = cur // jnp.uint32(10)
            rem = cur - q * jnp.uint32(10)
            new.append(q)
        new.reverse()
        return jnp.stack(new, axis=1), rem

    _, digits = jax.lax.scan(step, limbs, None, length=_MAX_DIGITS)
    # digits[i] is the 10^i digit; right-aligned means column 38 - i
    return digits[::-1].T


def _leaf_kernel(limbs):
    """uint32[n, 8] canonical limbs -> digest words (hhi, hlo) [8, n]."""
    n = limbs.shape[0]
    digits = _decimal_digits(limbs)  # [n, 39]
    nz = digits != 0
    any_nz = jnp.any(nz, axis=1)
    first = jnp.argmax(nz, axis=1).astype(jnp.int32)
    # value 0 encodes as "0" (one digit)
    length = jnp.where(any_nz, _MAX_DIGITS - first, 1).astype(jnp.uint32)
    start = (_MAX_DIGITS - length).astype(jnp.int32)

    ascii_digits = digits + jnp.uint32(ord("0"))
    padded = jnp.concatenate(
        [ascii_digits, jnp.zeros((n, _MAX_DIGITS + 1), jnp.uint32)], axis=1
    )
    idx = start[:, None] + jnp.arange(_MAX_DIGITS, dtype=jnp.int32)[None, :]
    shifted = jnp.take_along_axis(padded, idx, axis=1)
    msg = jnp.where(
        jnp.arange(_MAX_DIGITS, dtype=jnp.uint32)[None, :] < length[:, None],
        shifted,
        0,
    )  # [n, 39] bytes, left-aligned
    msg = jnp.concatenate([msg, jnp.zeros((n, 1), jnp.uint32)], axis=1)

    # pack bytes (little-endian) into 16 64-bit message words; only the first
    # 5 words can be nonzero (40 bytes)
    mhi, mlo = [], []
    for w in range(16):
        if 8 * w >= 40:
            mhi.append(jnp.zeros((n,), jnp.uint32))
            mlo.append(jnp.zeros((n,), jnp.uint32))
            continue
        lo = (
            msg[:, 8 * w]
            | (msg[:, 8 * w + 1] << 8)
            | (msg[:, 8 * w + 2] << 16)
            | (msg[:, 8 * w + 3] << 24)
        )
        hi = (
            msg[:, 8 * w + 4]
            | (msg[:, 8 * w + 5] << 8)
            | (msg[:, 8 * w + 6] << 16)
            | (msg[:, 8 * w + 7] << 24)
        )
        mhi.append(hi)
        mlo.append(lo)

    hhi, hlo = _compress(
        jnp.stack(mhi), jnp.stack(mlo), jnp.zeros((n,), jnp.uint32), length
    )
    return hhi, hlo


def _node_kernel(child_hi, child_lo):
    """Digest words [8, 2m] -> parent digest words [8, m].

    Parent message = left digest (64 bytes) || right digest (64 bytes): the
    children's word arrays ARE the message words.
    """
    left_hi, left_lo = child_hi[:, 0::2], child_lo[:, 0::2]
    right_hi, right_lo = child_hi[:, 1::2], child_lo[:, 1::2]
    mhi = jnp.concatenate([left_hi, right_hi], axis=0)
    mlo = jnp.concatenate([left_lo, right_lo], axis=0)
    return _compress(mhi, mlo, jnp.uint32(0), jnp.uint32(128))


@functools.lru_cache(maxsize=None)
def _leaf_jit():
    return jax.jit(_leaf_kernel)


@functools.lru_cache(maxsize=None)
def _node_jit():
    return jax.jit(_node_kernel)


def leaf_digest_words(limbs) -> tuple[jax.Array, jax.Array]:
    """Canonical uint32[n, 8] limbs -> device digest words ([8,n], [8,n])."""
    return _leaf_jit()(jnp.asarray(limbs))


def node_digest_words(hhi, hlo) -> tuple[jax.Array, jax.Array]:
    return _node_jit()(hhi, hlo)


def words_to_digest_np(hhi, hlo) -> np.ndarray:
    """Digest words [8, n] (host np) -> uint8[n, 64] little-endian bytes."""
    hhi = np.asarray(hhi, dtype=np.uint32)
    hlo = np.asarray(hlo, dtype=np.uint32)
    n = hhi.shape[1]
    out = np.empty((n, 64), dtype=np.uint8)
    for i in range(8):
        for b in range(4):
            out[:, 8 * i + b] = (hlo[i] >> (8 * b)).astype(np.uint8)
            out[:, 8 * i + 4 + b] = (hhi[i] >> (8 * b)).astype(np.uint8)
    return out


def blake2b512_ints_device(values) -> list[bytes]:
    """Hash each int's decimal encoding; host-facing convenience/parity API."""
    from .limbs import ints_to_limbs

    limbs = jnp.asarray(ints_to_limbs(values))
    hhi, hlo = leaf_digest_words(limbs)
    mat = words_to_digest_np(hhi, hlo)
    return [mat[i].tobytes() for i in range(mat.shape[0])]
