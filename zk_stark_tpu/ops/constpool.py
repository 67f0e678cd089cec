"""Constant pool: keep big cached device tables out of jitted HLO.

Problem: the prover's fused segments close over large precomputed tables
(twiddle matrices, power series, zerofier values, periodic-constant
codewords).  jax.jit embeds closed-over concrete arrays as literal constants
in the serialized program — hundreds of MB at 2^20 domains, which blows both
compile time and the remote-compile transport.

Mechanism: every cached-table accessor routes its array through
:func:`intern`.  Outside a pool context this is the identity.  Inside
:func:`pooled_jit`'s two-phase build it either *records* the (key, array)
pairs (discovery trace via eval_shape) or *substitutes* the corresponding
argument tracer (the real trace), so the tables enter the compiled program
as runtime inputs — uploaded once as device buffers, never serialized.
"""

from __future__ import annotations

import contextvars
from typing import Callable

import jax

_ACTIVE: contextvars.ContextVar = contextvars.ContextVar(
    "zk_constpool", default=None
)


class _Recorder:
    def __init__(self):
        self.keys: list = []
        self.arrays: list = []
        self._index: dict = {}

    def intern(self, key, arr):
        if key not in self._index:
            self._index[key] = len(self.keys)
            self.keys.append(key)
            self.arrays.append(arr)
        return arr


class _Binder:
    def __init__(self, mapping: dict):
        self.mapping = mapping

    def intern(self, key, arr):
        try:
            return self.mapping[key]
        except KeyError:
            # table first requested during the binding trace (cache warmth
            # differences); fall back to embedding it
            return arr


def intern(key, arr):
    """Route a cached concrete device array through the active pool."""
    ctx = _ACTIVE.get()
    if ctx is None:
        return arr
    return ctx.intern(key, arr)


def pooled_jit(fn: Callable) -> Callable:
    """jit ``fn`` with interned tables passed as arguments, not constants.

    The wrapped function is traced twice on first call: once abstractly to
    discover which tables it touches (and warm their caches), then for real
    with each table bound to an argument placeholder.
    """
    state: dict = {}

    def wrapper(*args):
        if "jitted" not in state:
            rec = _Recorder()
            tok = _ACTIVE.set(rec)
            try:
                jax.eval_shape(fn, *args)
            finally:
                _ACTIVE.reset(tok)
            keys = tuple(rec.keys)
            state["consts"] = tuple(rec.arrays)

            def inner(args_tuple, consts_tuple):
                binder = _Binder(dict(zip(keys, consts_tuple)))
                tok2 = _ACTIVE.set(binder)
                try:
                    return fn(*args_tuple)
                finally:
                    _ACTIVE.reset(tok2)

            state["jitted"] = jax.jit(inner)
        return state["jitted"](tuple(args), state["consts"])

    return wrapper
