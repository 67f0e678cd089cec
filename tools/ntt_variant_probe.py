#!/usr/bin/env python
"""Isolate the fused-stage NTT kernel's non-compute cost.

Hypothesis (r5): the per-stage twiddle broadcast ``tw[k, s, :h]`` lives on
the LANE axis of the table but is consumed on the SUBLANE axis of the data
tile — an implicit lane->sublane transpose per stage.  Variant B feeds a
pre-broadcast [8, log2n, n/2, 128] table so the kernel reads sublane-major
twiddles directly.  Variant A is the r4 per-stage form.
"""
from __future__ import annotations

import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from zk_stark_tpu.ops import limbs as L  # noqa: E402
from zk_stark_tpu.ops.ntt_pallas import (  # noqa: E402
    NLIMB,
    _stage_twiddle_table,
    add_mod_planes,
    mont_mul_planes,
    sub_mod_planes,
)


def log(m):
    print(m, file=sys.stderr, flush=True)


_S = jax.jit(lambda a: a.reshape(-1)[:4])


def dsync(x):
    np.asarray(_S(x))


def kernel_a(x_ref, tw_ref, o_ref, *, n):
    """r4 form: lane-major twiddle rows, per-stage reshape(1, h, 1)."""
    log2n = n.bit_length() - 1
    ctile = x_ref.shape[-1]
    for k in range(NLIMB):
        o_ref[k] = x_ref[k]
    for s in range(log2n):
        h = 1 << s
        g = n // (2 * h)
        xr = [o_ref[k].reshape(g, 2 * h, ctile) for k in range(NLIMB)]
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
        for k in range(NLIMB):
            o_ref[k] = jnp.concatenate([lo[k], hi[k]], axis=1).reshape(
                n, ctile
            )


def kernel_b(x_ref, tw_ref, o_ref, *, n):
    """Pre-broadcast sublane-major twiddles [8, log2n, n/2, 128]."""
    log2n = n.bit_length() - 1
    ctile = x_ref.shape[-1]
    for k in range(NLIMB):
        o_ref[k] = x_ref[k]
    for s in range(log2n):
        h = 1 << s
        g = n // (2 * h)
        xr = [o_ref[k].reshape(g, 2 * h, ctile) for k in range(NLIMB)]
        even = [xk[:, :h, :] for xk in xr]
        odd = [xk[:, h:, :] for xk in xr]
        w = [
            jnp.broadcast_to(
                tw_ref[k, s, :h, :].reshape(1, h, ctile), (g, h, ctile)
            )
            for k in range(NLIMB)
        ]
        t = mont_mul_planes(odd, w)
        hi = sub_mod_planes(even, t)
        lo = add_mod_planes(even, t)
        for k in range(NLIMB):
            o_ref[k] = jnp.concatenate([lo[k], hi[k]], axis=1).reshape(
                n, ctile
            )


def kernel_c(x_ref, tw_ref, twe_ref, o_ref, *, n):
    """Select-form early stages (h < 8, no sublane padding), slice-form
    for h >= 8.

    Early stage h: partner = row ^ h is a static permutation of each
    8-sublane group; one full-width multiply computes w*x_odd for both pair
    rows, then a mask selects add/sub.  twe_ref: [8, 3, 8, 128] host
    tables with twe[k, s, r, :] = tw[k, s, r & (2^s - 1)].
    """
    log2n = n.bit_length() - 1
    ctile = x_ref.shape[-1]
    g8 = n // 8
    cur = [x_ref[k] for k in range(NLIMB)]
    iota8 = jax.lax.broadcasted_iota(jnp.uint32, (g8, 8, ctile), 1)

    for s in range(min(3, log2n)):
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
            jnp.broadcast_to(twe_ref[k, s].reshape(1, 8, ctile),
                             (g8, 8, ctile))
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

    for s in range(3, log2n):
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

    for k in range(NLIMB):
        o_ref[k] = cur[k]


def early_tw_table(tw_np: np.ndarray) -> np.ndarray:
    """[8, log2n, n/2] stage table -> [8, 3, 8, 128] select-form early
    twiddles (value at [k, s, r, :] = tw[k, s, r & (2^s - 1)])."""
    out = np.zeros((NLIMB, 3, 8, 128), dtype=np.uint32)
    for s in range(3):
        h = 1 << s
        for r in range(8):
            out[:, s, r, :] = tw_np[:, s, r & (h - 1), None]
    return out


@functools.lru_cache(maxsize=None)
def make_call(which: str, n: int, c: int, ctile: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log2n = n.bit_length() - 1
    grid = (c // ctile,)
    data_spec = pl.BlockSpec(
        (NLIMB, n, ctile), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    params = pltpu.CompilerParams(vmem_limit_bytes=126 * 1024 * 1024)
    tw_spec = pl.BlockSpec(
        (NLIMB, log2n, n // 2), lambda i: (0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    if which == "a":
        kern = functools.partial(kernel_a, n=n)
        in_specs = [data_spec, tw_spec]
    elif which == "b":
        kern = functools.partial(kernel_b, n=n)
        in_specs = [
            data_spec,
            pl.BlockSpec(
                (NLIMB, log2n, n // 2, 128), lambda i: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
    else:
        kern = functools.partial(kernel_c, n=n)
        in_specs = [
            data_spec,
            tw_spec,
            pl.BlockSpec(
                (NLIMB, 3, 8, 128), lambda i: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]

    def call(x, *tws):
        return pl.pallas_call(
            kern,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((NLIMB, n, c), jnp.uint32),
            in_specs=in_specs,
            out_specs=data_spec,
            compiler_params=params,
        )(x, *tws)

    return jax.jit(call)


def main():
    from zk_stark_tpu.field import Field, FIELD_PRIME as P

    import random

    field = Field()
    random.seed(5)
    n, c, ctile = 1024, 1024, 128
    root = field.primitive_nth_root(n).value
    tw = jnp.asarray(_stage_twiddle_table(root, n))
    twb = jnp.asarray(
        np.repeat(np.asarray(tw)[:, :, :, None], 128, axis=3)
    )
    x = jnp.asarray(
        np.tile(
            np.asarray(
                L.ints_to_mont([random.randrange(P) for _ in range(4096)])
            ).reshape(4, 1024, 8)[0].T.reshape(NLIMB, 1024, 1),
            (1, 1, c),
        )
    )

    # rtt
    z = jnp.zeros((128,), jnp.uint32)
    dsync(z)
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        dsync(z)
        best = min(best, time.time() - t0)
    rtt = best

    twe = jnp.asarray(early_tw_table(np.asarray(tw)))
    fa = make_call("a", n, c, ctile)
    fc = make_call("c", n, c, ctile)
    ya = fa(x, tw)
    dsync(ya)
    yc = fc(x, tw, twe)
    dsync(yc)
    same = bool(jnp.all(ya == yc))
    log(f"a == c: {same}")
    assert same
    for name, f, args in (
        ("a_per_stage", fa, (x, tw)),
        ("c_select_early", fc, (x, tw, twe)),
    ):
        y = f(*args)
        dsync(y)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            for _ in range(10):
                y = f(*args)
            dsync(y)
            best = min(best, (time.time() - t0 - rtt) / 10)
        log(f"{name}: {best*1000:.3f} ms")


if __name__ == "__main__":
    main()
