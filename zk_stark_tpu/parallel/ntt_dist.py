"""Distributed four-step (Bailey) NTT over a device mesh.

This is the scaling story of the framework (SURVEY §7 step 9): evaluation
domains of 2^20..2^22 points are sharded across chips, local NTT stages run
on-chip, and the single cross-shard exchange is one ``all_to_all`` transpose
over ICI — the NTT analogue of sequence parallelism.

Decomposition (N = N1*N2, w a primitive N-th root):
    coefficient index  i = N2*i1 + i2     (natural order, matrix B[i1, i2])
    evaluation index   k = k1 + N1*k2
    X[k1 + N1*k2] = NTT_{i2->k2}^{w^N1}( w^{i2*k1} * NTT_{i1->k1}^{w^N2}(B)[k1, i2] )

Layouts:
* input  B[i1, i2]  with i2 (columns) sharded  — step-1 NTT along i1 is local;
* output Z[k2, k1]  with k1 (columns) sharded  — "transposed evaluation order":
  device holding column k1 has all k2 for that k1.

The transposed output order is deliberate: Hadamard products, constraint
evaluation and FRI folds are local in this layout (k and k + N/2 differ only
in k2, which lives on the same device), and the inverse transform consumes it
and returns natural coefficient order — so a full
evaluate -> pointwise -> interpolate pipeline does exactly two all_to_all
exchanges and nothing else crosses chips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import limbs as L
from ..ops.ntt import host_base_pows, ntt_body, powers_mont
from ..utils.bits import bit_reverse_indices, is_pow2
from . import mesh as mesh_lib
from .mesh import AXIS

P = L.P


def _local_ntt(x, root_int: int, n: int, axis: int):
    """NTT of length n along ``axis`` of x [..., 8]; root passed via host."""
    powtable = powers_mont(root_int, max(1, n // 2))
    brev = jnp.asarray(bit_reverse_indices(n))
    moved = jnp.moveaxis(x, axis, 0)
    out = ntt_body(moved, powtable, brev, n)
    return jnp.moveaxis(out, 0, axis)


@functools.lru_cache(maxsize=None)
def _twiddle_exps(n1: int, n2_local: int):
    k1 = jnp.arange(n1, dtype=jnp.uint32)[:, None]
    i2l = jnp.arange(n2_local, dtype=jnp.uint32)[None, :]
    return k1, i2l


def four_step_local(
    x_local,
    n1: int,
    n2: int,
    n_dev: int,
    root_int: int,
    tw_local=None,
    pow1=None,
    pow2=None,
    inverse: bool = False,
):
    """THE shard_map body of the distributed four-step NTT:
    x_local [n1, n2/D, 8] -> z_local [n2, n1/D, 8] with ONE all_to_all.

    This is the single four-step implementation — the prover engine
    (parallel.engine.DistEngine) and the scaling harness both wrap it.
    Twiddle strategy is an argument:

    * ``tw_local``/``pow1``/``pow2`` operands (engine): host-precomputed
      tables passed through the constpool, O(N) HBM but zero in-kernel pow —
      best when N fits comfortably;
    * in-body exponentiation (harness / N >= 2^22): ``pow_by_exponents``
      computes w^(i2*k1) from log2(N) base powers, no O(N) table.
    """
    root = pow(root_int, -1, P) if inverse else root_int

    # step 1: length-n1 NTT along i1 (local columns), root w^{n2}
    if pow1 is not None:
        y = ntt_body(
            x_local, pow1, jnp.asarray(bit_reverse_indices(n1)), n1
        )
    else:
        y = _local_ntt(x_local, pow(root, n2, P), n1, axis=0)

    # step 2: twiddle w^{i2*k1} with i2 = d*n2_local + i2_local
    if tw_local is not None:
        y = L.mont_mul(y, tw_local)
    else:
        d = jax.lax.axis_index(AXIS)
        n2_local = n2 // n_dev
        k1, i2l = _twiddle_exps(n1, n2_local)
        exps = (i2l + d * n2_local) * k1  # [n1, n2/D], uint32 for N <= 2^32
        nbits = max(1, (n1 * n2 - 1).bit_length())
        basepows = host_base_pows(root, nbits)
        ones = jnp.broadcast_to(jnp.asarray(L.ONE_MONT), y.shape)
        from ..ops.ntt import pow_by_exponents

        tw = pow_by_exponents(ones, basepows, exps, nbits)
        y = L.mont_mul(y, tw)

    # step 3: all_to_all transpose -> [n1/D, n2, 8]
    y = jax.lax.all_to_all(y, AXIS, split_axis=0, concat_axis=1, tiled=True)

    # step 4: length-n2 NTT along i2 (now full rows), root w^{n1}
    if pow2 is not None:
        z = jnp.moveaxis(
            ntt_body(
                jnp.moveaxis(y, 1, 0),
                pow2,
                jnp.asarray(bit_reverse_indices(n2)),
                n2,
            ),
            0,
            1,
        )
    else:
        z = _local_ntt(y, pow(root, n1, P), n2, axis=1)

    # emit [k2, k1_local]: device d holds k1 in [d*n1/D, (d+1)*n1/D)
    return jnp.swapaxes(z, 0, 1)


def _four_step_local(
    x_local, root_int: int, n1: int, n2: int, n_dev: int, inverse: bool
):
    return four_step_local(
        x_local, n1, n2, n_dev, root_int, inverse=inverse
    )


def _scale_local(x_local, scalar_int: int):
    s = L.int_to_mont(scalar_int)
    return L.mont_mul(x_local, jnp.broadcast_to(s, x_local.shape))


@functools.lru_cache(maxsize=None)
def _ntt_dist_fn(n1: int, n2: int, n_dev: int, root_int: int, inverse: bool):
    """Jitted sharded four-step NTT for fixed geometry."""
    mesh = mesh_lib.make_mesh(n_dev)
    in_spec = jax.sharding.PartitionSpec(None, AXIS, None)
    out_spec = jax.sharding.PartitionSpec(None, AXIS, None)

    def fn(x):
        def body(x_local):
            z = _four_step_local(x_local, root_int, n1, n2, n_dev, inverse)
            if inverse:
                z = _scale_local(z, pow(n1 * n2, -1, P))
            return z

        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=in_spec,
            out_specs=out_spec,
            check_vma=False,
        )(x)

    return jax.jit(fn), mesh


def ntt_dist(x: jax.Array, root_int: int, n_dev: int) -> jax.Array:
    """Forward distributed NTT.

    x: [n1, n2, 8] natural coefficient order (flat index N2*i1 + i2), columns
    sharded.  Returns [n2, n1, 8] in transposed evaluation order: entry
    (k2, k1) is the evaluation at w^(k1 + n1*k2); columns (k1) sharded.
    """
    n1, n2 = x.shape[0], x.shape[1]
    assert is_pow2(n1) and is_pow2(n2)
    fn, mesh = _ntt_dist_fn(n1, n2, n_dev, root_int, False)
    x = jax.device_put(x, mesh_lib.col_sharding(mesh))
    return fn(x)


def intt_dist(z: jax.Array, root_int: int, n_dev: int) -> jax.Array:
    """Inverse distributed NTT.

    z: [n2, n1, 8] transposed evaluation order (as produced by ntt_dist).
    Returns [n1, n2, 8] natural coefficient order, columns sharded.

    Implementation: the forward map with root w maps (natural, [n1,n2]) ->
    (transposed, [n2,n1]).  Applying the same four-step machinery with
    geometry (n2, n1) and root w^-1 to z maps back, with 1/N scaling.
    """
    n2, n1 = z.shape[0], z.shape[1]
    fn, mesh = _ntt_dist_fn(n2, n1, n_dev, root_int, True)
    z = jax.device_put(z, mesh_lib.col_sharding(mesh))
    return fn(z)


def flatten_natural(m: jax.Array) -> jax.Array:
    """Flatten either matrix layout to the flat natural-order vector [N, 8].

    Both the input layout B[i1, i2] (flat i = n2*i1 + i2) and the output
    layout Z[k2, k1] (flat k = k1 + n1*k2 = row-major position) are natural
    order when flattened row-major — only their *shardings* differ, which is
    exactly what the all_to_all exchange pays for.
    """
    return m.reshape(m.shape[0] * m.shape[1], L.NLIMB)
