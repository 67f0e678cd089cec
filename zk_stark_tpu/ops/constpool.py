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


def build_pooled(fn: Callable):
    """Run a zero-argument table builder as ONE compiled program.

    For the lru-cached device-table builders (zerofier/cumprod/h-table/...):
    the former op-by-op eager build cost a ~0.4 s XLA compile plus a
    transport dispatch *per op* on the remote backend — measured as the
    dominant share of cold-start wall time (r5, jax_log_compiles).

    Must be safe under an ambient ``jax.ensure_compile_time_eval()`` (the
    builders are reachable from inside jit/shard_map traces): that context
    is just ``config.eager_constant_folding(True)``, which would make the
    *discovery* trace execute fn eagerly op-by-op — exactly the cost this
    helper removes — so discovery explicitly disables it.  The single
    compiled program is then invoked under ``ensure_compile_time_eval`` so
    the result is concrete even when first reached during an outer trace.
    Tables touched via :func:`intern` enter as runtime arguments, never HLO
    constants (the remote-compile transport rejects huge programs).
    """
    rec = _Recorder()
    tok = _ACTIVE.set(rec)
    try:
        try:
            from jax._src.config import eager_constant_folding
        except ImportError:  # future-jax fallback: plain abstract trace
            import contextlib

            def eager_constant_folding(_):
                return contextlib.nullcontext()

        with eager_constant_folding(False):
            jax.eval_shape(fn)
    finally:
        _ACTIVE.reset(tok)
    keys = tuple(rec.keys)
    consts = tuple(rec.arrays)

    def inner(consts_tuple):
        binder = _Binder(dict(zip(keys, consts_tuple)))
        tok2 = _ACTIVE.set(binder)
        try:
            return fn()
        finally:
            _ACTIVE.reset(tok2)

    with jax.ensure_compile_time_eval():
        return jax.jit(inner)(consts)


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
