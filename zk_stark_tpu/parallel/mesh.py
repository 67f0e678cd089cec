"""Device mesh helpers for multi-chip sharding.

The evaluation domain is the framework's "sequence" dimension: codewords and
coefficient vectors of length 2^20+ are sharded across chips on a 1-D mesh
(axis name "shard"), with the four-step NTT exchanging butterfly stages via
all_to_all over ICI (see parallel.ntt_dist).  The reference is single-address-
space Rust with no distribution (SURVEY §2/§5); this layer is new capability.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "shard"


@functools.lru_cache(maxsize=None)
def _make_mesh_cached(n_devices: int | None, device_key) -> Mesh:
    devices = list(device_key) if device_key is not None else jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}"
        )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """One Mesh instance per device set (sharding equality relies on it).

    ``devices`` (a tuple, e.g. one ICI row of a multihost.hybrid_mesh)
    overrides the default ``jax.devices()`` prefix.
    """
    return _make_mesh_cached(
        n_devices, tuple(devices) if devices is not None else None
    )


def col_sharding(mesh: Mesh) -> NamedSharding:
    """[rows, cols, limbs] with cols sharded across the mesh."""
    return NamedSharding(mesh, P(None, AXIS, None))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """[rows, cols, limbs] with rows sharded across the mesh."""
    return NamedSharding(mesh, P(AXIS, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
