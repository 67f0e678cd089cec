"""Multi-host bootstrap + hybrid ICI x DCN mesh layout (parallel.multihost)."""

from types import SimpleNamespace

import jax

from zk_stark_tpu.parallel import multihost


def test_initialize_single_process_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert multihost.initialize() is False


def test_hybrid_mesh_single_host():
    mesh = multihost.hybrid_mesh()
    n = len(jax.devices())
    assert mesh.axis_names == (multihost.DCN_AXIS, "shard")
    assert mesh.devices.shape == (1, n)


def test_device_grid_multi_process_layout():
    fakes = [
        SimpleNamespace(process_index=p, id=4 * p + d)
        for p in (2, 0, 1, 3)
        for d in (3, 1, 0, 2)
    ]
    grid = multihost._device_grid(fakes)
    assert grid.shape == (4, 4)
    # rows ordered by process, columns by device id
    assert [d.process_index for d in grid[:, 0]] == [0, 1, 2, 3]
    assert [d.id for d in grid[1]] == [4, 5, 6, 7]
    # ici cap folds leftover per-host devices into the DCN axis
    regrid = grid.reshape(8, 2)
    assert regrid.shape == (8, 2)
