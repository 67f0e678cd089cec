"""Execution engines: single-device vs mesh-sharded prover compute.

The STARK prover pipeline (stark.py seg1/seg2, fri.py commit) is written
against this small interface so the SAME protocol code runs single-chip or
sharded over a ``jax.sharding.Mesh`` — byte-identical proofs either way
(all arithmetic is exact uint32 limb math; only placement changes).

``Engine`` is the identity/default.  ``DistEngine``:

* NTT/iNTT run as the explicit four-step (Bailey) decomposition under
  ``shard_map``: local row transforms + ONE ``all_to_all`` transpose over
  the mesh axis (see parallel.ntt_dist for the derivation).  Transforms
  too small to tile over the mesh fall back to the single-device kernel
  (replicated — identical values).
* ``batch_inv`` runs shard-local (elementwise semantics make the
  per-shard Montgomery product trick exact).
* ``constrain`` pins large flat arrays to block sharding
  (``PartitionSpec('shard', None)``) so XLA/GSPMD keeps the elementwise
  stages (AIR evaluation, folds, combination) partitioned between the
  explicit collectives.

The reference has no distributed story (SURVEY §2/§5: single-threaded
Rust); this layer is the new capability the BASELINE north star requires.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as PSpec

from ..ops import limbs as L
from ..ops.ntt import _pad_pow2, intt_mont, ntt_mont, scalar_mul_mont
from ..utils.bits import is_pow2
from . import mesh as mesh_lib
from .mesh import AXIS

P = L.P


class Engine:
    """Single-device engine (the default): plain ops, no sharding hints."""

    is_distributed = False
    cache_key = ("single",)

    def ntt(self, x: jax.Array, root_int: int) -> jax.Array:
        return ntt_mont(x, root_int)

    def intt(self, x: jax.Array, root_int: int) -> jax.Array:
        return intt_mont(x, root_int)

    def batch_inv(self, x: jax.Array) -> jax.Array:
        return L.batch_inv(x)

    def constrain(self, x: jax.Array) -> jax.Array:
        return x


DEFAULT = Engine()


@functools.lru_cache(maxsize=None)
def _four_step_geometry(n: int) -> tuple[int, int]:
    logn = n.bit_length() - 1
    r = 1 << ((logn + 1) // 2)
    return r, n // r


@functools.lru_cache(maxsize=None)
def _dist_ntt_call(n1: int, n2: int, n_dev: int, root_int: int, devs=None):
    """Jitted shard_map four-step NTT for fixed geometry.

    Input  [n1, n2, 8]  coefficient matrix (i = n2*i1 + i2), i2 sharded;
    output [n2, n1, 8]  transposed evaluation matrix (k = k1 + n1*k2),
    k1 sharded.  The step-2 twiddle w^(i2*k1) and both local powtables are
    host-precomputed and passed as operands: nothing inside the shard_map
    body may touch a global lru cache — a table first computed during the
    Manual-mesh trace gets a Manual-typed aval cached, which later poisons
    unrelated jit traces ("Mesh for all inputs should be equal").
    jit-wrapped: a bare shard_map call dispatches eagerly op-by-op
    (measured ~70s/call on the CPU mesh).
    """
    from .ntt_dist import four_step_local

    mesh = mesh_lib.make_mesh(n_dev, devs)
    spec = PSpec(None, AXIS, None)
    repl = PSpec(None, None)

    def body(x_local, tw_local, pow1, pow2):
        # delegate to THE four-step body (parallel.ntt_dist) with the
        # operand-table twiddle strategy
        return four_step_local(
            x_local, n1, n2, n_dev, root_int,
            tw_local=tw_local, pow1=pow1, pow2=pow2,
        )

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, repl, repl),
        out_specs=spec,
        check_vma=False,
    )
    return jax.jit(mapped)


@functools.lru_cache(maxsize=None)
def _dist_twiddle(root_int: int, n1: int, n2: int) -> jax.Array:
    """[n1, n2, 8] Montgomery table of root^(k1*i2) (step-2 twiddles)."""
    from ..ops.ntt import _twiddle_matrix_cached

    return _twiddle_matrix_cached(root_int, n1, n2)


class DistEngine(Engine):
    """Mesh-sharded engine over an ``n_devices``-wide 1-D mesh."""

    is_distributed = True

    #: transforms below this length run single-device (replicated): the
    #: four-step tiling needs n1 % D == 0 and n2 % D == 0
    def __init__(self, n_devices: int, devices=None):
        assert n_devices & (n_devices - 1) == 0, "device count must be pow2"
        self.n_devices = n_devices
        self.devices = tuple(devices) if devices is not None else None
        self.mesh = mesh_lib.make_mesh(n_devices, self.devices)
        self.cache_key = ("dist", n_devices, self.devices)
        self._flat_sharding = NamedSharding(self.mesh, PSpec(AXIS, None))

    def _distributable(self, n: int) -> bool:
        if not is_pow2(n):
            return False
        n1, n2 = _four_step_geometry(n)
        d = self.n_devices
        return n1 % d == 0 and n2 % d == 0

    def constrain(self, x: jax.Array) -> jax.Array:
        if (
            x.ndim == 2
            and x.shape[0] % self.n_devices == 0
            and x.shape[0] >= 2 * self.n_devices
        ):
            return jax.lax.with_sharding_constraint(x, self._flat_sharding)
        return x

    def ntt(self, x: jax.Array, root_int: int) -> jax.Array:
        """Forward NTT of Montgomery values [n, 8]; pads to pow2.

        Distributed path: natural flat -> [n1, n2] coefficient matrix
        (columns i2 mesh-sharded) -> four-step with one all_to_all ->
        transposed evaluation matrix [n2, n1] whose row-major flatten IS
        the natural evaluation order -> flat, block-sharded.
        """
        x = _pad_pow2(jnp.asarray(x))
        n = x.shape[0]
        if n < 2:
            return x
        if not self._distributable(n):
            return ntt_mont(x, root_int)
        from ..ops.constpool import intern
        from ..ops.ntt import powers_mont

        n1, n2 = _four_step_geometry(n)
        root = root_int % P
        xm = x.reshape(n1, n2, L.NLIMB)
        tw = intern(
            ("twiddle", root, n1, n2), _dist_twiddle(root, n1, n2)
        )
        pow1 = powers_mont(pow(root, n2, P), max(1, n1 // 2))
        pow2 = powers_mont(pow(root, n1, P), max(1, n2 // 2))
        z = _dist_ntt_call(n1, n2, self.n_devices, root, self.devices)(
            xm, tw, pow1, pow2
        )
        return self.constrain(z.reshape(n, L.NLIMB))

    def intt(self, x: jax.Array, root_int: int) -> jax.Array:
        x = jnp.asarray(x)
        if x.shape[0] < 2:
            return x
        n = (
            x.shape[0]
            if is_pow2(x.shape[0])
            else 1 << (x.shape[0] - 1).bit_length()
        )
        y = self.ntt(x, pow(root_int, -1, P))
        return self.constrain(scalar_mul_mont(y, pow(n, -1, P)))

    def batch_inv(self, x: jax.Array) -> jax.Array:
        n = x.shape[0]
        if x.ndim != 2 or n % self.n_devices or n < 8 * self.n_devices:
            return L.batch_inv(x)
        fn = _dist_batch_inv_call(n, self.n_devices, self.devices)
        return fn(self.constrain(x))


@functools.lru_cache(maxsize=None)
def dist_engine(n_devices: int) -> DistEngine:
    """Cached DistEngine per device count (engines key compiled-kernel
    caches, so reuse matters)."""
    return DistEngine(n_devices)


@functools.lru_cache(maxsize=None)
def engine_for_hybrid(mesh=None, row: int = 0) -> DistEngine:
    """DistEngine over one ICI row of a ``multihost.hybrid_mesh``.

    The hybrid (proof, shard) layout assigns independent proof statements to
    DCN rows and shards each proof's domain over that row's ICI devices —
    O(domain) collectives (NTT all_to_all, fold pairing) never cross DCN.
    This is the reachable path from ``Stark(engine=...)``:

        mesh = multihost.hybrid_mesh()
        stark.engine = stark.fri.engine = engine_for_hybrid(mesh, row)
    """
    from .multihost import hybrid_mesh

    if mesh is None:
        mesh = hybrid_mesh()
    devs = tuple(mesh.devices[row])
    return DistEngine(len(devs), devices=devs)


@functools.lru_cache(maxsize=None)
def _dist_batch_inv_call(n: int, n_dev: int, devs=None):
    mesh = mesh_lib.make_mesh(n_dev, devs)
    spec = PSpec(AXIS, None)
    return jax.jit(
        jax.shard_map(
            L.batch_inv,
            mesh=mesh,
            in_specs=spec,
            out_specs=spec,
            check_vma=False,
        )
    )
