"""Pallas TPU kernel: fused row-NTT stages in VMEM (limb-plane layout).

The jnp four-step NTT (ops.ntt) materializes the full [R, C, 8] array in HBM
once per butterfly stage — ~21 full-array round trips for a 2^20 transform,
which measures ~10x slower than the raw elementwise Montgomery-multiply
throughput.  This kernel keeps a [8, R, ctile] tile of limb *planes* resident
in VMEM and runs all log2(R) stages (plus the four-step twiddle multiply) in
one pass, so HBM sees each element exactly twice per half-transform.

Layout: limb-major planes ``uint32[8, R, C]`` (plane k = limb k), so every
per-limb slice is a well-tiled [R, ctile] (sublane x lane) 2D array.  The
transform runs along the R (sublane) axis; C is the batch (lane) axis, tiled
by the grid.  Input rows must already be in bit-reversed order.

Capability-equivalent of the reference iterative NTT
(ref: /root/reference/src/fft/ntt.rs:7-49); bit-exact against ops.ntt.ntt_body.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs as L

NLIMB = L.NLIMB
MASK = L.MASK
LIMB_BITS = L.LIMB_BITS

#: run pallas_call in interpreter mode (CPU parity testing); set before the
#: first call for a given shape (calls are cached per shape)
INTERPRET = False


# -----------------------------------------------------------------------------
# Plane-list field arithmetic (same math as ops.limbs, on lists of 8 arrays)
# -----------------------------------------------------------------------------


def _add_planes(a, b):
    out, carry = [], jnp.zeros_like(a[0])
    for k in range(NLIMB):
        s = a[k] + b[k] + carry
        out.append(s & MASK)
        carry = s >> LIMB_BITS
    return out, carry


def _sub_planes(a, b):
    out, borrow = [], jnp.zeros_like(a[0])
    for k in range(NLIMB):
        d = (a[k] | np.uint32(1 << LIMB_BITS)) - (b[k] + borrow)
        out.append(d & MASK)
        borrow = 1 - (d >> LIMB_BITS)
    return out, borrow


def _sub_p_planes(a):
    out, borrow = [], jnp.zeros_like(a[0])
    for k in range(NLIMB):
        d = (a[k] | np.uint32(1 << LIMB_BITS)) - (
            np.uint32(L.P_LIMBS[k]) + borrow
        )
        out.append(d & MASK)
        borrow = 1 - (d >> LIMB_BITS)
    return out, borrow


def _add_p_planes(a):
    out, carry = [], jnp.zeros_like(a[0])
    for k in range(NLIMB):
        s = a[k] + np.uint32(L.P_LIMBS[k]) + carry
        out.append(s & MASK)
        carry = s >> LIMB_BITS
    return out, carry


def add_mod_planes(a, b):
    s, carry = _add_planes(a, b)
    d, borrow = _sub_p_planes(s)
    take_d = (carry == 1) | (borrow == 0)
    return [jnp.where(take_d, dk, sk) for dk, sk in zip(d, s)]


def sub_mod_planes(a, b):
    d, borrow = _sub_planes(a, b)
    dp, _ = _add_p_planes(d)
    take_dp = borrow == 1
    return [jnp.where(take_dp, dpk, dk) for dpk, dk in zip(dp, d)]


def mont_mul_planes(a, b):
    """Montgomery product on plane lists (same bounds as limbs.mont_mul)."""
    az = a[0] * np.uint32(0)
    t = [az + b[0] * np.uint32(0) for _ in range(2 * NLIMB + 1)]
    for i in range(NLIMB):
        for j in range(NLIMB):
            prod = a[i] * b[j]
            t[i + j] = t[i + j] + (prod & MASK)
            t[i + j + 1] = t[i + j + 1] + (prod >> LIMB_BITS)
    for k in range(NLIMB):
        m = (t[k] * np.uint32(L.NPRIME)) & MASK
        for j in range(NLIMB):
            mp = m * np.uint32(L.P_LIMBS[j])
            t[k + j] = t[k + j] + (mp & MASK)
            t[k + j + 1] = t[k + j + 1] + (mp >> LIMB_BITS)
        t[k + 1] = t[k + 1] + (t[k] >> LIMB_BITS)
    out, carry = [], az
    for k in range(NLIMB, 2 * NLIMB):
        v = t[k] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    top = t[2 * NLIMB] + carry
    d, borrow = _sub_p_planes(out)
    take_d = (top > 0) | (borrow == 0)
    return [jnp.where(take_d, dk, rk) for dk, rk in zip(d, out)]


def redc_planes(a):
    """Montgomery reduction of a field element (NOT a double-width product):
    returns a * R^-1 mod p.  Equivalent to ``mont_mul_planes(a, one)`` but
    skips the schoolbook product (multiplying by 1 just copies the limbs
    into the columns), i.e. the canonical-form conversion at half cost.
    """
    az = a[0] * np.uint32(0)
    t = [a[k] for k in range(NLIMB)] + [az] * (NLIMB + 1)
    for k in range(NLIMB):
        m = (t[k] * np.uint32(L.NPRIME)) & MASK
        for j in range(NLIMB):
            mp = m * np.uint32(L.P_LIMBS[j])
            t[k + j] = t[k + j] + (mp & MASK)
            t[k + j + 1] = t[k + j + 1] + (mp >> LIMB_BITS)
        t[k + 1] = t[k + 1] + (t[k] >> LIMB_BITS)
    out, carry = [], az
    for k in range(NLIMB, 2 * NLIMB):
        v = t[k] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    top = t[2 * NLIMB] + carry
    d, borrow = _sub_p_planes(out)
    take_d = (top > 0) | (borrow == 0)
    return [jnp.where(take_d, dk, rk) for dk, rk in zip(d, out)]


# -----------------------------------------------------------------------------
# Fused-stage kernel
# -----------------------------------------------------------------------------


def _stage_twiddle_table(root_int: int, n: int) -> np.ndarray:
    """Per-stage twiddles, padded: uint32[8, log2n, n/2].

    Row s holds root^(j * n / 2^(s+1)) for j in [0, 2^s) (stage s needs the
    first 2^s entries; the rest is padding so every row is n/2 wide).
    """
    log2n = n.bit_length() - 1
    p = L.P
    out = np.zeros((NLIMB, log2n, max(1, n // 2)), dtype=np.uint32)
    for s in range(log2n):
        h = 1 << s
        step = n >> (s + 1)
        w = 1
        base = pow(root_int, step, p)
        for j in range(h):
            mont = w * L.R_INT % p
            for k in range(NLIMB):
                out[k, s, j] = (mont >> (LIMB_BITS * k)) & MASK
            w = w * base % p
    return out


#: butterfly stages below this half-width run in SELECT form (see kernel
#: docstring); 8 = the VPU sublane tile height
_SELECT_H = 8


def _ntt_stages_kernel(
    x_ref, tw_ref, twe_ref, ft_ref, o_ref, *, n: int, fuse_tw: bool
):
    """All log2(n) butterfly stages on one VMEM tile.

    x_ref/o_ref: [8, n, ctile] limb planes, rows bit-reversed on input.
    tw_ref: [8, log2n, n/2] per-stage twiddles.
    twe_ref: [8, 3, 8, 128] select-form early-stage twiddles
    (twe[k, s, r, :] = tw[k, s, r & (2^s - 1)], see _early_tw_table).
    ft_ref: [8, n, ctile] four-step twiddle tile (only when fuse_tw,
    applied after the last stage).

    Stages are unrolled at trace time (the reshape geometry changes per
    stage).  Two formulations per stage (r5 piecewise profile):

    * h < 8: SELECT form — the [g, h, ctile] views of the slice form pad
      their h-sized sublane axis to 8, costing 8x/4x/2x at h = 1/2/4;
      instead the partner (row ^ h) is a static permutation of each
      8-sublane group and one full-width multiply + mask covers the
      butterfly without padding.
    * h >= 8: SLICE form — contiguous even/odd row slices, one
      concat+reshape reshuffle per stage.

    A 16-register bundled variant (radix-16 data movement) was measured
    3x SLOWER (strided register slices); a constant-geometry Pease
    fori_loop likewise.  Row lengths above 2^10 spill VMEM and recurse
    through :func:`_planes_long_ntt`.
    """
    log2n = n.bit_length() - 1
    ctile = x_ref.shape[-1]
    n_sel = min(3, log2n) if n >= _SELECT_H and ctile == 128 else 0
    g8 = n // 8

    cur = [x_ref[k] for k in range(NLIMB)]  # [n, ctile] planes

    if n_sel:
        iota8 = jax.lax.broadcasted_iota(jnp.uint32, (g8, 8, ctile), 1)
    for s in range(n_sel):
        h = 1 << s
        even = (iota8 & h) == 0
        xr = [ck.reshape(g8, 8, ctile) for ck in cur]
        # partner row r ^ h via two full-axis circular rolls + select: the
        # wrapped lanes only land on rows the select discards
        p = [
            jnp.where(
                even,
                jnp.roll(ck, -h, axis=0).reshape(g8, 8, ctile),
                jnp.roll(ck, h, axis=0).reshape(g8, 8, ctile),
            )
            for ck in cur
        ]
        w = [
            jnp.broadcast_to(
                twe_ref[k, s].reshape(1, 8, ctile), (g8, 8, ctile)
            )
            for k in range(NLIMB)
        ]
        sel = [jnp.where(even, pk, xk) for pk, xk in zip(p, xr)]
        t = mont_mul_planes(sel, w)
        added = add_mod_planes(xr, t)
        subbed = sub_mod_planes(p, t)
        cur = [
            jnp.where(even, ak, sk).reshape(n, ctile)
            for ak, sk in zip(added, subbed)
        ]

    for s in range(n_sel, log2n):
        h = 1 << s
        g = n // (2 * h)
        xr = [ck.reshape(g, 2 * h, ctile) for ck in cur]
        even = [xk[:, :h, :] for xk in xr]
        odd = [xk[:, h:, :] for xk in xr]
        w = [
            jnp.broadcast_to(
                tw_ref[k, s, :h].reshape(1, h, 1), (g, h, ctile)
            )
            for k in range(NLIMB)
        ]
        t = mont_mul_planes(odd, w)
        hi = sub_mod_planes(even, t)
        lo = add_mod_planes(even, t)
        cur = [
            jnp.concatenate([lo[k], hi[k]], axis=1).reshape(n, ctile)
            for k in range(NLIMB)
        ]

    if fuse_tw:
        ft = [ft_ref[k] for k in range(NLIMB)]
        cur = mont_mul_planes(cur, ft)
    for k in range(NLIMB):
        o_ref[k] = cur[k]


@functools.lru_cache(maxsize=None)
def _ntt_planes_call(n: int, c: int, ctile: int, fuse_tw: bool, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log2n = n.bit_length() - 1
    grid = (c // ctile,)
    data_spec = pl.BlockSpec(
        (NLIMB, n, ctile), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    tw_spec = pl.BlockSpec(
        (NLIMB, log2n, n // 2), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    twe_spec = pl.BlockSpec(
        (NLIMB, 3, 8, 128), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_ntt_stages_kernel, n=n, fuse_tw=fuse_tw)
    if fuse_tw:
        in_specs = [data_spec, tw_spec, twe_spec, data_spec]
    else:
        # dummy 1-element four-step table keeps the kernel signature uniform
        in_specs = [
            data_spec,
            tw_spec,
            twe_spec,
            pl.BlockSpec(
                (NLIMB, 1, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ]

    # v5e/v6e have 128 MB of VMEM; grant the kernel most of it so the
    # pipeliner can double-buffer the 4 MB data tiles around the stage loop
    # (the loop body itself keeps one stage's temporaries live)
    params = None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=110 * 1024 * 1024
    )

    def call(x_planes, tw, twe, ft):
        return pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((NLIMB, n, c), jnp.uint32),
            in_specs=in_specs,
            out_specs=data_spec,
            interpret=interpret,
            compiler_params=params,
        )(x_planes, tw, twe, ft)

    return call


#: lane-tile width; 128 matches the VPU lane count.  [8, 1024, 128] data tile
#: plus mont_mul temporaries stays within VMEM.
_CTILE = 128


@functools.lru_cache(maxsize=None)
def _stage_tw_dev(root_int: int, n: int):
    with jax.ensure_compile_time_eval():
        return jnp.asarray(_stage_twiddle_table(root_int, n))


def _early_tw_table(tw_np: np.ndarray) -> np.ndarray:
    """[8, log2n, n/2] stage table -> [8, 3, 8, 128] select-form early
    twiddles: value at [k, s, r, :] = tw[k, s, r & (2^s - 1)] (the
    period-2h twiddle pattern of stage s replicated over the lanes)."""
    out = np.zeros((NLIMB, 3, 8, 128), dtype=np.uint32)
    n_sel = min(3, tw_np.shape[1])
    for s in range(n_sel):
        h = 1 << s
        for r in range(8):
            out[:, s, r, :] = tw_np[:, s, r & (h - 1), None]
    return out


@functools.lru_cache(maxsize=None)
def _early_tw_dev(root_int: int, n: int):
    with jax.ensure_compile_time_eval():
        return jnp.asarray(
            _early_tw_table(_stage_twiddle_table(root_int, n))
        )


def _tw_pair(root_int: int, n: int):
    """Interned (stage, early) twiddle tables for a length-n transform."""
    from .constpool import intern

    tw = intern(
        ("pallas_stage_tw", root_int, n), _stage_tw_dev(root_int, n)
    )
    twe = intern(
        ("pallas_early_tw", root_int, n), _early_tw_dev(root_int, n)
    )
    return tw, twe


def _planes_long_ntt(planes, root_int: int, c: int):
    """Length-c NTT along axis 1 of [8, c, B] planes for c > 2^10, itself
    four-step-decomposed as c = a*b (a = 2^10 Pallas rows, b <= 2^10):
    row transforms with root^b -> twiddle root^(k1*i2) -> transpose ->
    row transforms with root^a.  Input must be in NATURAL order (this
    function applies its own bit-reversals); output is natural order.
    """
    from .constpool import intern
    from .ntt import _brev

    p = L.P
    a = 1 << _MAX_STAGES_PER_PASS
    b = c // a
    assert a * b == c and b >= 2
    B = planes.shape[2]

    tw_a, twe_a = _tw_pair(pow(root_int, b, p), a)
    tw_b, twe_b = _tw_pair(pow(root_int, a, p), b)
    ft = intern(
        ("pallas_ft_tw", root_int, a, b), _ft_planes(root_int, a, b)
    )  # [8, a, b]

    x2 = planes.reshape(NLIMB, a, b * B)  # i = i1*b + i2, i2 merged w/ B
    x2 = x2.reshape(NLIMB, a, b, B)
    xb = jnp.take(x2, _brev(a), axis=1).reshape(NLIMB, a, b * B)
    y = ntt_planes(xb, tw_a, twe_a, None, n=a)  # i1 -> k1 per (i2, B) col
    y4 = y.reshape(NLIMB, a, b, B)
    tw = [ft[k][:, :, None] for k in range(NLIMB)]
    y4 = jnp.stack(
        mont_mul_planes([y4[k] for k in range(NLIMB)], tw)
    )  # * root^(k1*i2)
    yt = jnp.swapaxes(y4, 1, 2)  # [8, b, a, B]
    yb = jnp.take(yt, _brev(b), axis=1).reshape(NLIMB, b, a * B)
    z = ntt_planes(yb, tw_b, twe_b, None, n=b)  # i2 -> k2
    # output flat k = k1 + a*k2: axis1 (k2) is already the major component
    return z.reshape(NLIMB, c, B)


@functools.lru_cache(maxsize=None)
def _four_step_pallas(n: int, root_int: int | None = None):
    """Jitted Pallas four-step NTT: [n, 8] natural order -> [n, 8].

    Same decomposition as ops.ntt._four_step_kernel (n = R*C, row NTT +
    twiddle + transpose + row NTT), with each row transform running all its
    butterfly stages in VMEM; only the bit-reverse gathers and the transposes
    touch HBM between stages.

    Row lengths are capped at 2^10 (the fused kernel's VMEM tile limit:
    2048-row tiles spill ~160 MB against v5e's 128 MB even stage-split, and
    Pallas cannot shrink the lane tile below 128).  Beyond 2^20 total the
    decomposition goes unbalanced (r = 2^10, c = n/2^10) and the LONG
    c-length pass recurses through :func:`_planes_long_ntt` (c = 2^10 * b),
    so every butterfly still runs in the fused VMEM kernel; ``root_int``
    is required (and part of the cache key) for that path because the
    recursion's twiddle tables are baked per root.
    """
    logn = n.bit_length() - 1
    r = 1 << min((logn + 1) // 2, _MAX_STAGES_PER_PASS)
    c = n // r
    long_cols = c > (1 << _MAX_STAGES_PER_PASS)
    root_c = pow(root_int, r, L.P) if long_cols else None

    def kernel(x, brev_r, brev_c, tw_r, twe_r, tw_c, twe_c, ft):
        x2 = x.reshape(r, c, NLIMB)
        xb = jnp.take(x2, brev_r, axis=0)
        planes = xb.transpose(2, 0, 1)                  # [8, r, c]
        y = ntt_planes(planes, tw_r, twe_r, ft, n=r)    # i1 -> k1, * w^(k1*i2)
        if long_cols:
            z = _planes_long_ntt(y.transpose(0, 2, 1), root_c, c)
        else:
            yt = jnp.take(y.transpose(0, 2, 1), brev_c, axis=1)  # [8, c, r]
            z = ntt_planes(yt, tw_c, twe_c, None, n=c)  # i2 -> k2
        return z.transpose(1, 2, 0).reshape(n, NLIMB)   # flat k = k1 + r*k2

    # interpret mode runs eagerly: jit-wrapping an interpret pallas call
    # inlines the interpreter machinery into one giant XLA-CPU program
    # (tens of minutes to compile, measured r5)
    return (kernel if INTERPRET else jax.jit(kernel)), r, c, long_cols


def ntt_mont_pallas(x, root_int: int):
    """Forward NTT of Montgomery values via the fused-stage Pallas kernels.

    Bit-exact against ops.ntt.ntt_mont; requires a TPU backend and a
    power-of-two input length >= 4.
    """
    from .constpool import intern
    from .ntt import _brev

    n = x.shape[0]
    assert n >= 4 and (n & (n - 1)) == 0, (
        f"ntt_mont_pallas requires a power-of-two length >= 4, got {n} "
        "(pad with ops.ntt._pad_pow2 or use ops.ntt.ntt_mont)"
    )
    logn = n.bit_length() - 1
    long_root = root_int if logn > 2 * _MAX_STAGES_PER_PASS else None
    kern, r, c, long_cols = _four_step_pallas(n, long_root)
    p = L.P
    tw_r, twe_r = _tw_pair(pow(root_int, c, p), r)
    if long_cols:
        tw_c = jnp.zeros((NLIMB, 1, 1), dtype=jnp.uint32)
        twe_c = jnp.zeros((NLIMB, 3, 8, 128), dtype=jnp.uint32)
    else:
        tw_c, twe_c = _tw_pair(pow(root_int, r, p), c)
    ft = intern(
        ("pallas_ft_tw", root_int, r, c), _ft_planes(root_int, r, c)
    )
    return kern(x, _brev(r), _brev(c), tw_r, twe_r, tw_c, twe_c, ft)


@functools.lru_cache(maxsize=None)
def _ft_planes(root_int: int, r: int, c: int):
    from .ntt import _twiddle_build

    # plane transpose fused into the twiddle build program (the eager
    # transpose compiled a fresh program per (r, c) instance)
    return _twiddle_build(root_int, r, c, True)


#: max butterfly stages per pallas pass: the unrolled 10-stage dataflow at
#: ctile=128 is ~90 MB of scoped VMEM (fits v5e's 128 MB); 11 stages spill
#: to 184 MB (measured OOM at 2^21/2^22 four-step rows)
_MAX_STAGES_PER_PASS = 10


def ntt_planes(x_planes, tw, twe, ft=None, *, n: int):
    """Transform bit-reversed limb planes [8, n, c] along axis 1.

    ``tw``: [8, log2n, n/2] stage twiddles (:func:`_stage_twiddle_table`);
    ``twe``: [8, 3, 8, 128] select-form early-stage twiddles
    (:func:`_early_tw_table`; pass None only when the kernel's select path
    is inactive, i.e. c-tile < 128);
    ``ft``: optional [8, n, c] four-step twiddle multiplied in after the
    last stage.  Row lengths above 2^10 do not fit VMEM and must route
    through :func:`_planes_long_ntt` (the recursive four-step split).
    """
    c = x_planes.shape[-1]
    ctile = min(_CTILE, c)
    assert c % ctile == 0
    assert n <= 1 << _MAX_STAGES_PER_PASS, (
        f"fused-stage kernel supports rows <= 2^{_MAX_STAGES_PER_PASS} "
        "(VMEM tile limit); longer transforms go through the hybrid "
        "four-step in ntt_mont_pallas"
    )
    fuse = ft is not None
    if ft is None:
        ft = jnp.zeros((NLIMB, 1, 1), dtype=jnp.uint32)
    if twe is None:
        twe = jnp.zeros((NLIMB, 3, 8, 128), dtype=jnp.uint32)
    return _ntt_planes_call(n, c, ctile, fuse, INTERPRET)(
        x_planes, tw, twe, ft
    )
