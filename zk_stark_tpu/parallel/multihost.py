"""Multi-host runtime initialization and hybrid ICI x DCN mesh layout.

The reference has no communication backend at all (SURVEY §2 "parallelism
strategies": single-threaded Rust).  This module is the TPU-native
equivalent of a NCCL/MPI bootstrap layer:

* :func:`initialize` wraps ``jax.distributed.initialize`` — one call per
  process on a multi-host slice (or multi-slice DCN deployment) before any
  device use; it is a no-op in single-process runs so the same entry point
  works everywhere.
* :func:`hybrid_mesh` lays out the global devices as a 2-D
  ``(dcn, ici)`` mesh: the domain ("sequence") axis used by the sharded
  prover maps to the *ici* axis so the four-step NTT's ``all_to_all`` and
  the FRI fold's pairing permute ride intra-slice ICI bandwidth; the *dcn*
  axis spans slices/hosts and carries only embarrassingly-parallel work —
  independent proof statements (data parallelism over signatures), whose
  transcripts never need cross-slice communication.

Design rule (scaling-book recipe): collectives that move O(domain) bytes
(NTT transpose, fold pairing) must never cross DCN; the only cross-DCN
traffic a multi-slice prover deployment needs is job dispatch and the
O(proof) result bytes, both host-side.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import AXIS

#: DCN (cross-slice / cross-host) axis name for hybrid meshes
DCN_AXIS = "proof"


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize the JAX distributed runtime for multi-host execution.

    Arguments default to the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``); on cloud TPU pods, ``jax.distributed.initialize``
    auto-discovers all three.  Returns True if the distributed runtime was
    (or already is) initialized, False for explicit single-process runs
    (no coordinator configured) where initialization is skipped.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    # Detect prior initialization WITHOUT touching backends:
    # jax.process_count() enumerates devices and initializes XLA, after
    # which jax.distributed.initialize() raises ("must be called before any
    # JAX device operations") — exactly the multi-process case this module
    # exists for (ADVICE r2).
    if _distributed_client_active():
        return True  # already initialized
    if coordinator_address is None and num_processes in (None, 1):
        return False  # single-process run: nothing to do

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _distributed_client_active() -> bool:
    """True iff jax.distributed.initialize() already ran in this process.

    Backend-safe: inspects the distributed global state only (public
    ``is_initialized`` when the jax version has it, else the private
    client handle) — never calls device-enumerating APIs.
    """
    is_init = getattr(jax.distributed, "is_initialized", None)
    if is_init is not None:
        return bool(is_init())
    from jax._src import distributed as _dist

    return getattr(_dist.global_state, "client", None) is not None


def _device_grid(devices) -> np.ndarray:
    """Group a flat device list into a [hosts, devices_per_host] grid.

    Devices of one process share ICI (a slice); slices are connected over
    DCN.  Deterministic ordering: by (process_index, id).
    """
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    by_proc: dict[int, list] = {}
    for d in devices:
        by_proc.setdefault(d.process_index, []).append(d)
    counts = {len(v) for v in by_proc.values()}
    assert len(counts) == 1, (
        f"uneven devices per process: { {k: len(v) for k, v in by_proc.items()} }"
    )
    return np.array([by_proc[k] for k in sorted(by_proc)], dtype=object)


def hybrid_mesh(devices=None, ici_parallelism: int | None = None) -> Mesh:
    """2-D ``(proof, shard)`` mesh: DCN-parallel proofs x ICI-sharded domain.

    ``ici_parallelism`` caps the shard axis width (defaults to all devices
    of each host/slice); any leftover per-slice devices widen the proof
    axis.  Single-host device lists produce a [1, n] grid, so the prover's
    ``shard`` axis semantics are identical everywhere.
    """
    if devices is None:
        devices = jax.devices()
    grid = _device_grid(devices)
    hosts, per_host = grid.shape
    if ici_parallelism is None:
        ici_parallelism = per_host
    assert per_host % ici_parallelism == 0, (
        f"{per_host} devices per host not divisible by ici={ici_parallelism}"
    )
    grid = grid.reshape(hosts * (per_host // ici_parallelism), ici_parallelism)
    return Mesh(grid, (DCN_AXIS, AXIS))
