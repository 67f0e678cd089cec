"""Pallas TPU kernel: fused FRI split-and-fold round.

The FRI fold (ref: /root/reference/src/fri.rs:151-159) is pure elementwise
field math, but the XLA formulation over uint32[n, 8] limb rows measured
27% of speed-of-light at 2^20 (BENCH_r02) — the 8-wide minor dimension
wastes 15/16 of the VPU lanes and the mont-mul temporaries round-trip HBM.
This kernel runs the whole round on limb *planes* ([8, rows, 128]) resident
in VMEM:

    folded = 2^-1 * ((lo + hi) + (alpha/offset) * w^-i * (lo - hi))
    canon  = REDC(folded)                    (the Merkle leaf input)

with three Montgomery multiplies + one half-cost REDC per output element,
one HBM read of the codeword + inverse-power table and one write of the
two result arrays.  Bit-exact against fri._fold_round_kernel (same limb
algorithms, see ops.ntt_pallas plane arithmetic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import limbs as L
from .ntt_pallas import (
    NLIMB,
    add_mod_planes,
    mont_mul_planes,
    redc_planes,
    sub_mod_planes,
)

#: run pallas_call in interpreter mode (CPU parity testing)
INTERPRET = False

#: sublane-rows per grid step ([8, rtile, 128] blocks, ~1 MB each)
_RTILE = 256


def _fold_kernel(lo_ref, hi_ref, ip_ref, ao_ref, ti_ref, fold_ref, canon_ref):
    lo = [lo_ref[k] for k in range(NLIMB)]
    hi = [hi_ref[k] for k in range(NLIMB)]
    ip = [ip_ref[k] for k in range(NLIMB)]
    shape = lo[0].shape
    ao = [jnp.broadcast_to(ao_ref[k], shape) for k in range(NLIMB)]
    ti = [jnp.broadcast_to(ti_ref[k], shape) for k in range(NLIMB)]

    f = mont_mul_planes(ip, ao)
    s = add_mod_planes(lo, hi)
    d = sub_mod_planes(lo, hi)
    t = mont_mul_planes(f, d)
    folded = mont_mul_planes(ti, add_mod_planes(s, t))
    canon = redc_planes(folded)
    for k in range(NLIMB):
        fold_ref[k] = folded[k]
        canon_ref[k] = canon[k]


@functools.lru_cache(maxsize=None)
def _fold_call(hrows: int, rtile: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (hrows // rtile,)
    data = pl.BlockSpec(
        (NLIMB, rtile, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    scal = pl.BlockSpec(
        (NLIMB, 1, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((NLIMB, hrows, 128), jnp.uint32)

    def call(lo, hi, ip, ao, ti):
        return pl.pallas_call(
            _fold_kernel,
            grid=grid,
            out_shape=(shape, shape),
            in_specs=[data, data, data, scal, scal],
            out_specs=(data, data),
            interpret=interpret,
        )(lo, hi, ip, ao, ti)

    return call


def fold_supported(n: int) -> bool:
    """Pallas fold needs a half length that tiles as [rows, 128].

    Gated to n >= 2^16 in production (every Mosaic shape costs ~30 s of
    remote compile; below that the jnp fold is already sub-0.1 ms, so the
    cold-compile cost can never amortize).  INTERPRET lifts the floor for
    parity tests.
    """
    half = n // 2
    if half < 128 or half % 128:
        return False
    if INTERPRET:
        return True
    return n >= (1 << 16) and jax.default_backend() == "tpu"


@functools.lru_cache(maxsize=None)
def fold_round_pallas(n: int):
    """Jitted fused fold round: (cw [n,8], invpows [n/2,8], ao [8],
    two_inv [8]) -> (folded [n/2,8], canon [n/2,8]).  Same signature and
    bit-identical results as fri._fold_round_kernel's jnp form.
    """
    half = n // 2
    hrows = half // 128
    rows = n // 128
    rtile = min(_RTILE, hrows)
    assert hrows % rtile == 0

    def fn(cw, invpows, ao, two_inv):
        planes = cw.reshape(rows, 128, NLIMB).transpose(2, 0, 1)
        lo, hi = planes[:, :hrows], planes[:, hrows:]
        ip = invpows.reshape(hrows, 128, NLIMB).transpose(2, 0, 1)
        aop = ao.reshape(NLIMB, 1, 1)
        tip = two_inv.reshape(NLIMB, 1, 1)
        folded, canon = _fold_call(hrows, rtile, INTERPRET)(
            lo, hi, ip, aop, tip
        )

        def unplane(pl_arr):
            return pl_arr.transpose(1, 2, 0).reshape(half, NLIMB)

        return unplane(folded), unplane(canon)

    # interpret mode must NOT be jit-wrapped: jit inlines the pallas
    # interpreter's blocked-loop machinery into one giant XLA-CPU program
    # (measured r5: the n=1024 fold did not compile in 25 minutes, vs
    # seconds when the interpret call runs eagerly)
    return fn if INTERPRET else jax.jit(fn)
