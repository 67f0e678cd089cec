"""On-device batched BLAKE2b-512 for Merkle hashing.

TPU-native replacement for the host hashing loop in Merkle commitment
(ref: /root/reference/src/merkle_root.rs:21-32 + crypto/blake2b512.rs:4-14).
Byte parity is mandatory: leaves hash the *decimal-string* encoding of the
field element (ref: field_element.rs:46-50); inner nodes hash the 128-byte
concatenation of two digests.

Both message classes fit a single BLAKE2b compression block (decimal string
of a < 2^128 value is <= 39 bytes; two digests are exactly 128 bytes), so the
whole primitive is one compression function, vectorized elementwise over the
batch:

* 64-bit words are (hi, lo) pairs of uint32 arrays — adds carry via an
  unsigned compare, rotations are shift/or pairs;
* on TPU the compression runs as a **Pallas kernel**: message words live as
  16 lane-vectors in VMEM and the 12 rounds are fully unrolled with the
  static SIGMA schedule, so the ~3.5k uint32 ops per element never touch HBM
  between rounds (the round-2 XLA formulation measured 0.9% of
  speed-of-light; the fori_loop+dynamic-gather variant is kept only as the
  CPU fallback because XLA-CPU cannot compile the unrolled form in
  reasonable time);
* decimal encoding runs in XLA ahead of the kernel: 39 short divisions by 10
  over the 8x16-bit canonical limbs, then a take_along_axis shift
  left-aligns the digits into the message block.

Digest levels are packed as ONE uint32[2, 8, m] array ((hi, lo) x word x
element) so a Merkle level moves to the host in a single transfer — over the
remote-TPU transport a dispatch+fetch round trip costs ~28 ms regardless of
size, so minimizing fetches matters more than minimizing bytes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import LIMB_BITS, NLIMB

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

#: run the Pallas compression in interpreter mode (CPU parity testing)
INTERPRET = False


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
        s = np.uint32(r)
        t = np.uint32(32 - r)
        return (h >> s) | (l << t), (l >> s) | (h << t)
    # r == 63 is rotl by 1
    assert r == 63
    return (h << 1) | (l >> 31), (l << 1) | (h >> 31)


def _g(vhi, vlo, rows, xh, xl, yh, yl):
    """One BLAKE2b G mix on state lists ``vhi``/``vlo`` (in place)."""
    a, b, c, d = rows
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
    vhi[a], vhi[b], vhi[c], vhi[d] = ah, bh, ch, dh
    vlo[a], vlo[b], vlo[c], vlo[d] = al, bl, cl, dl


def _init_state(shape, t_hi, t_lo):
    def bc(x):
        return jnp.broadcast_to(np.uint32(x), shape)

    vhi = [bc(_H0 >> 32)] + [bc(_hi(_IV[i])) for i in range(1, 8)] + [
        bc(_hi(_IV[i])) for i in range(8)
    ]
    vlo = [bc(_H0 & 0xFFFFFFFF)] + [bc(_lo(_IV[i])) for i in range(1, 8)] + [
        bc(_lo(_IV[i])) for i in range(8)
    ]
    # v12 ^= t (message byte count); v14 ^= -1 (final block flag)
    vhi[12] = vhi[12] ^ jnp.broadcast_to(jnp.asarray(t_hi, jnp.uint32), shape)
    vlo[12] = vlo[12] ^ jnp.broadcast_to(jnp.asarray(t_lo, jnp.uint32), shape)
    vhi[14] = vhi[14] ^ np.uint32(0xFFFFFFFF)
    vlo[14] = vlo[14] ^ np.uint32(0xFFFFFFFF)
    return vhi, vlo


def _finalize(vhi, vlo):
    hhi, hlo = [], []
    for i in range(8):
        iv = _H0 if i == 0 else _IV[i]
        hhi.append(np.uint32(_hi(iv)) ^ vhi[i] ^ vhi[i + 8])
        hlo.append(np.uint32(_lo(iv)) ^ vlo[i] ^ vlo[i + 8])
    return hhi, hlo


def _compress(mhi, mlo, t_hi, t_lo):
    """One final-block BLAKE2b-512 compression, batched over trailing dims.

    ``mhi``/``mlo``: length-16 lists of uint32 [...] message-word arrays;
    ``t_hi``/``t_lo``: uint32 byte-count scalars or [...]-shaped arrays.
    Returns digest words (hhi, hlo), each a length-8 list of [...] arrays.
    Fully unrolled (12 rounds x 8 G), all message indexing static — this is
    the TPU/Pallas form.
    """
    vhi, vlo = _init_state(mhi[0].shape, t_hi, t_lo)
    for r in range(12):
        srow = _SIGMA[r]
        for i, rows in enumerate(_G_ROWS):
            xi, yi = int(srow[2 * i]), int(srow[2 * i + 1])
            _g(vhi, vlo, rows, mhi[xi], mlo[xi], mhi[yi], mlo[yi])
    return _finalize(vhi, vlo)


def _compress_loop(mhi, mlo, t_hi, t_lo):
    """Same compression with the rounds under ``lax.fori_loop`` and the
    SIGMA schedule applied by dynamic indexing into stacked [16, ...]
    message words.  ~100x slower at runtime on TPU but compiles in seconds
    on XLA-CPU (the unrolled form does not) — the CPU-backend fallback.
    """
    mhi = jnp.stack(mhi)
    mlo = jnp.stack(mlo)
    vhi, vlo = _init_state(mhi.shape[1:], t_hi, t_lo)
    vhi = jnp.stack(vhi)
    vlo = jnp.stack(vlo)
    sigma = jnp.asarray(_SIGMA)

    def round_body(r, state):
        vhi, vlo = state
        srow = jax.lax.dynamic_index_in_dim(sigma, r, axis=0, keepdims=False)
        vh = [vhi[i] for i in range(16)]
        vl = [vlo[i] for i in range(16)]
        for i, rows in enumerate(_G_ROWS):
            xi, yi = srow[2 * i], srow[2 * i + 1]
            xh = jax.lax.dynamic_index_in_dim(mhi, xi, 0, keepdims=False)
            xl = jax.lax.dynamic_index_in_dim(mlo, xi, 0, keepdims=False)
            yh = jax.lax.dynamic_index_in_dim(mhi, yi, 0, keepdims=False)
            yl = jax.lax.dynamic_index_in_dim(mlo, yi, 0, keepdims=False)
            _g(vh, vl, rows, xh, xl, yh, yl)
        return jnp.stack(vh), jnp.stack(vl)

    vhi, vlo = jax.lax.fori_loop(0, 12, round_body, (vhi, vlo))
    return _finalize([vhi[i] for i in range(16)], [vlo[i] for i in range(16)])


def _use_pallas() -> bool:
    return INTERPRET or jax.default_backend() == "tpu"


# -----------------------------------------------------------------------------
# Pallas compression kernel
# -----------------------------------------------------------------------------

#: sublane rows per compression tile: each message word is an [S, 128]
#: uint32 plane — a full multiple of the VPU's native 8x128 vector tile.
#: (The round-3 kernel kept each word as a 1-D [2048] vector, which lowers
#: to a 1-sublane layout and left 7/8 of every VPU issue empty: measured
#: 12% of speed-of-light.  Retiling to 2-D planes is the whole fix.)
_STILE = 32


def _stile_for(m: int) -> int:
    """Tile rows for a batch of m messages: full 32-row tiles for bulk
    work, the 8-row VPU minimum for small batches (keeps the pad — and the
    CPU interpret-mode test programs — small)."""
    return _STILE if m >= _STILE * 128 else 8


def _compress_pallas_kernel(mhi_ref, mlo_ref, t_ref, o_ref):
    """Compression of one [16, S, 128] message tile -> [2, 8, S, 128]."""
    mhi = [mhi_ref[k] for k in range(16)]
    mlo = [mlo_ref[k] for k in range(16)]
    hhi, hlo = _compress(mhi, mlo, np.uint32(0), t_ref[0])
    for k in range(8):
        o_ref[0, k] = hhi[k]
        o_ref[1, k] = hlo[k]


@functools.lru_cache(maxsize=None)
def _compress_call(m: int, interpret: bool):
    """m must be a multiple of the tile size; element i lives at plane
    position (i // 128, i % 128) of [m // 128, 128] (a contiguous
    reshape)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    stile = _stile_for(m)
    ctile = stile * 128
    assert m % ctile == 0
    rows = m // 128
    grid = (m // ctile,)
    mspec = pl.BlockSpec(
        (16, stile, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    tspec = pl.BlockSpec(
        (1, stile, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    ospec = pl.BlockSpec(
        (2, 8, stile, 128),
        lambda i: (0, 0, i, 0),
        memory_space=pltpu.VMEM,
    )

    def call(mhi, mlo, t_lo):
        out = pl.pallas_call(
            _compress_pallas_kernel,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((2, 8, rows, 128), jnp.uint32),
            in_specs=[mspec, mspec, tspec],
            out_specs=ospec,
            interpret=interpret,
        )(
            mhi.reshape(16, rows, 128),
            mlo.reshape(16, rows, 128),
            t_lo.reshape(1, rows, 128),
        )
        return out.reshape(2, 8, m)

    return call


def _compress_words(mhi, mlo, t_lo):
    """Dispatch: message words [16, m] x2 + byte counts [m] -> [2, 8, m].

    Pallas on TPU (or interpret mode); unrolled XLA elsewhere is too slow to
    compile on CPU, so the CPU path uses the fori_loop form.
    """
    m = mhi.shape[1]
    if _use_pallas():
        pad = (-m) % (_stile_for(m) * 128)  # tile-align for the kernel grid
        if pad:
            mhi = jnp.pad(mhi, ((0, 0), (0, pad)))
            mlo = jnp.pad(mlo, ((0, 0), (0, pad)))
            t_lo = jnp.pad(t_lo, (0, pad))
            return _compress_call(m + pad, INTERPRET)(mhi, mlo, t_lo)[
                :, :, :m
            ]
        return _compress_call(m, INTERPRET)(mhi, mlo, t_lo)
    hhi, hlo = _compress_loop(
        [mhi[k] for k in range(16)],
        [mlo[k] for k in range(16)],
        np.uint32(0),
        t_lo,
    )
    return jnp.stack([jnp.stack(hhi), jnp.stack(hlo)])


# -----------------------------------------------------------------------------
# Fused Pallas kernels: leaf encode+compress, node de-interleave+compress
# -----------------------------------------------------------------------------
#
# VERDICT r4 item 3: the tree build measured 6.3% of the bare-compression
# ceiling because the decimal leaf encoding ran in XLA over 1-D [n] digit
# columns (1 of 8 sublanes used) and every node level paid an HBM round trip
# for the even/odd digest de-interleave.  Both now run INSIDE the
# compression kernel on [S, 128] VMEM tiles: HBM sees the canonical limbs
# once and each digest level once.


def _leaf_tile(cols, ctile_shape):
    """Decimal-encode one tile: 8 limb planes [S, 128] -> (mhi, mlo, t) lists.

    Same math as :func:`_leaf_message` (39 short divisions by 10, digit
    count, left-align select chain, little-endian word packing) on 2-D VPU
    tiles instead of 1-D columns."""
    zero = jnp.zeros(ctile_shape, jnp.uint32)
    d = []
    for _ in range(_MAX_DIGITS):
        rem = zero
        new = [None] * NLIMB
        for k in reversed(range(NLIMB)):
            cur = (rem << LIMB_BITS) | cols[k]
            q = cur // np.uint32(10)
            rem = cur - q * np.uint32(10)
            new[k] = q
        cols = new
        d.append(rem)

    length = jnp.ones(ctile_shape, jnp.uint32)
    for i in range(1, _MAX_DIGITS):
        length = jnp.where(d[i] != 0, np.uint32(i + 1), length)

    msg = []
    for j in range(_MAX_DIGITS):
        acc = zero
        for i in range(_MAX_DIGITS - j):
            acc = jnp.where(
                length == np.uint32(i + j + 1),
                d[i] + np.uint32(ord("0")),
                acc,
            )
        msg.append(acc)
    msg.append(zero)  # byte 39

    mhi, mlo = [], []
    for w in range(16):
        if 8 * w >= 40:
            mhi.append(zero)
            mlo.append(zero)
            continue
        lo = (
            msg[8 * w]
            | (msg[8 * w + 1] << 8)
            | (msg[8 * w + 2] << 16)
            | (msg[8 * w + 3] << 24)
        )
        hi = (
            msg[8 * w + 4]
            | (msg[8 * w + 5] << 8)
            | (msg[8 * w + 6] << 16)
            | (msg[8 * w + 7] << 24)
        )
        mhi.append(hi)
        mlo.append(lo)
    return mhi, mlo, length


def _leaf_fused_kernel(planes_ref, o_ref):
    """Canonical limb planes [8, S, 128] -> packed digests [2, 8, S, 128]."""
    cols = [planes_ref[k] for k in range(NLIMB)]
    mhi, mlo, t = _leaf_tile(cols, cols[0].shape)
    hhi, hlo = _compress(mhi, mlo, np.uint32(0), t)
    for k in range(8):
        o_ref[0, k] = hhi[k]
        o_ref[1, k] = hlo[k]


def _node_split_kernel(l_ref, r_ref, o_ref):
    """Left/right child digest tiles [2, 8, S, 128] x2 -> parents
    [2, 8, S, 128].

    Assumes the level is stored in the SPLIT (bit-reversed) layout: left
    children contiguous in the first half, right children in the second —
    so the message words are direct tile reads, no lane de-interleave
    (Mosaic cannot lower a [2S, 128] -> [2S, 64, 2] lane-splitting
    reshape)."""
    s = l_ref.shape[2]
    mhi = [l_ref[0, k] for k in range(8)] + [r_ref[0, k] for k in range(8)]
    mlo = [l_ref[1, k] for k in range(8)] + [r_ref[1, k] for k in range(8)]
    t = jnp.full((s, 128), 128, jnp.uint32)
    hhi, hlo = _compress(mhi, mlo, np.uint32(0), t)
    for k in range(8):
        o_ref[0, k] = hhi[k]
        o_ref[1, k] = hlo[k]


@functools.lru_cache(maxsize=None)
def _leaf_fused_call(m: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    stile = _stile_for(m)
    ctile = stile * 128
    assert m % ctile == 0
    rows = m // 128
    grid = (m // ctile,)
    in_spec = pl.BlockSpec(
        (NLIMB, stile, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (2, 8, stile, 128), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
    )

    def call(planes):
        out = pl.pallas_call(
            _leaf_fused_kernel,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((2, 8, rows, 128), jnp.uint32),
            in_specs=[in_spec],
            out_specs=out_spec,
            interpret=interpret,
        )(planes.reshape(NLIMB, rows, 128))
        return out.reshape(2, 8, m)

    return call


@functools.lru_cache(maxsize=None)
def _node_split_call(m: int, interpret: bool):
    """m parents from two contiguous m-wide child halves."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    stile = _stile_for(m)
    ctile = stile * 128
    assert m % ctile == 0
    rows = m // 128
    grid = (m // ctile,)
    spec = pl.BlockSpec(
        (2, 8, stile, 128), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
    )

    def call(left, right):
        out = pl.pallas_call(
            _node_split_kernel,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((2, 8, rows, 128), jnp.uint32),
            in_specs=[spec, spec],
            out_specs=spec,
            interpret=interpret,
        )(
            left.reshape(2, 8, rows, 128),
            right.reshape(2, 8, rows, 128),
        )
        return out.reshape(2, 8, m)

    return call


# -----------------------------------------------------------------------------
# Leaf hashing: decimal-string encoding + single-block compression
# -----------------------------------------------------------------------------

#: max decimal digits of a value < 2^128
_MAX_DIGITS = 39


def _leaf_message(limbs):
    """uint32[n, 8] canonical limbs -> (mhi [16, n], mlo [16, n], len [n]).

    Everything runs on 1-D [n] digit columns with static indexing: the
    left-align of the decimal string is a select chain over the 39 possible
    digit counts (a ``take_along_axis`` variable shift measured ~120 ms at
    2^18 on TPU; the selects fuse to sub-ms).
    """
    n = limbs.shape[0]
    zero = jnp.zeros((n,), jnp.uint32)

    # LSD-first digit columns d[i] via an unrolled chain of short divisions
    cols = [limbs[:, k] for k in range(NLIMB)]
    d = []
    for _ in range(_MAX_DIGITS):
        rem = zero
        new = [None] * NLIMB
        for k in reversed(range(NLIMB)):
            cur = (rem << LIMB_BITS) | cols[k]
            q = cur // np.uint32(10)
            rem = cur - q * np.uint32(10)
            new[k] = q
        cols = new
        d.append(rem)

    # significant digit count; value 0 encodes as "0" (one digit)
    length = jnp.ones((n,), jnp.uint32)
    for i in range(1, _MAX_DIGITS):
        length = jnp.where(d[i] != 0, np.uint32(i + 1), length)

    # left-aligned ASCII bytes: msg[j] = d[L-1-j] + '0' for j < L, else 0
    msg = []
    for j in range(_MAX_DIGITS):
        acc = zero
        for i in range(_MAX_DIGITS - j):
            acc = jnp.where(
                length == np.uint32(i + j + 1),
                d[i] + np.uint32(ord("0")),
                acc,
            )
        msg.append(acc)
    msg.append(zero)  # byte 39

    # pack bytes (little-endian) into 16 64-bit message words; only the first
    # 5 words can be nonzero (40 bytes)
    mhi, mlo = [], []
    for w in range(16):
        if 8 * w >= 40:
            mhi.append(zero)
            mlo.append(zero)
            continue
        lo = (
            msg[8 * w]
            | (msg[8 * w + 1] << 8)
            | (msg[8 * w + 2] << 16)
            | (msg[8 * w + 3] << 24)
        )
        hi = (
            msg[8 * w + 4]
            | (msg[8 * w + 5] << 8)
            | (msg[8 * w + 6] << 16)
            | (msg[8 * w + 7] << 24)
        )
        mhi.append(hi)
        mlo.append(lo)
    return jnp.stack(mhi), jnp.stack(mlo), length


def leaf_digests_packed(limbs):
    """uint32[n, 8] canonical limbs -> packed digest words [2, 8, n].

    TPU: ONE fused Pallas dispatch (decimal encode + compression in VMEM);
    the only XLA work is the [n, 8] -> limb-plane transpose.  CPU: the
    original column-wise XLA encode + fori_loop compression.
    """
    n = limbs.shape[0]
    if _use_pallas():
        pad = (-n) % (_stile_for(n) * 128)
        if pad:
            limbs = jnp.pad(limbs, ((0, pad), (0, 0)))
        rows = (n + pad) // 128
        planes = limbs.reshape(rows, 128, NLIMB).transpose(2, 0, 1)
        out = _leaf_fused_call(n + pad, INTERPRET)(planes)
        return out[:, :, :n] if pad else out
    mhi, mlo, length = _leaf_message(limbs)
    return _compress_words(mhi, mlo, length)


def node_digests_packed(d):
    """Packed digest level [2, 8, 2m] -> parent level [2, 8, m].

    Parent message = left digest (64 bytes) || right digest (64 bytes): the
    children's word planes ARE the message words (even/odd de-interleave)."""
    m = d.shape[2] // 2
    mhi = jnp.concatenate([d[0, :, 0::2], d[0, :, 1::2]], axis=0)
    mlo = jnp.concatenate([d[1, :, 0::2], d[1, :, 1::2]], axis=0)
    t = jnp.full((m,), 128, jnp.uint32)
    return _compress_words(mhi, mlo, t)


def node_digests_split(d):
    """Split-layout node step: [2, 8, 2m] whose first m entries are the
    LEFT children and last m the RIGHT children -> parents [2, 8, m].

    With every level stored in bit-reversed order the split is free (the
    halves are contiguous) and the parent level comes out bit-reversed
    too, so the whole tree builds with zero strided memory ops — the
    device-tree builder's layout (see merkle._tree_builder)."""
    m = d.shape[2] // 2
    if _use_pallas():
        stile = _stile_for(m)
        pad = (-m) % (stile * 128)
        left, right = d[:, :, :m], d[:, :, m:]
        if pad:
            left = jnp.pad(left, ((0, 0), (0, 0), (0, pad)))
            right = jnp.pad(right, ((0, 0), (0, 0), (0, pad)))
        out = _node_split_call(m + pad, INTERPRET)(left, right)
        return out[:, :, :m] if pad else out
    mhi = jnp.concatenate([d[0, :, :m], d[0, :, m:]], axis=0)
    mlo = jnp.concatenate([d[1, :, :m], d[1, :, m:]], axis=0)
    t = jnp.full((m,), 128, jnp.uint32)
    return _compress_words(mhi, mlo, t)


# -- legacy/unpacked API (parity helpers + tests) -----------------------------


def _leaf_kernel(limbs):
    """uint32[n, 8] canonical limbs -> digest words (hhi, hlo) [8, n]."""
    d = leaf_digests_packed(limbs)
    return d[0], d[1]


def _node_kernel(child_hi, child_lo):
    d = node_digests_packed(jnp.stack([child_hi, child_lo]))
    return d[0], d[1]


@functools.lru_cache(maxsize=None)
def _leaf_jit():
    return jax.jit(_leaf_kernel)


def leaf_digest_words(limbs) -> tuple[jax.Array, jax.Array]:
    """Canonical uint32[n, 8] limbs -> device digest words ([8,n], [8,n])."""
    if INTERPRET:
        # never jit-wrap an interpret-mode pallas call: jit inlines the
        # interpreter's blocked-loop machinery into one giant XLA-CPU
        # program that takes tens of minutes to compile (r5)
        return _leaf_kernel(jnp.asarray(limbs))
    return _leaf_jit()(jnp.asarray(limbs))


def node_digest_words(hhi, hlo) -> tuple[jax.Array, jax.Array]:
    return _node_kernel(hhi, hlo)


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


def packed_to_digest_np(d) -> np.ndarray:
    """Packed digest words [2, 8, n] (host np) -> uint8[n, 64] bytes."""
    d = np.asarray(d, dtype=np.uint32)
    return words_to_digest_np(d[0], d[1])


def blake2b512_ints_device(values) -> list[bytes]:
    """Hash each int's decimal encoding; host-facing convenience/parity API."""
    from .limbs import ints_to_limbs

    limbs = jnp.asarray(ints_to_limbs(values))
    hhi, hlo = leaf_digest_words(limbs)
    mat = words_to_digest_np(hhi, hlo)
    return [mat[i].tobytes() for i in range(mat.shape[0])]
