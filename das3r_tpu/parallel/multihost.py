"""Multi-host initialization & mesh helpers.

On a multi-host TPU slice every host runs the same program;
``initialize_distributed()`` wires hosts together (the NCCL
``init_distributed_mode`` equivalent, reference training.py:83,174) and the
global mesh then spans all chips — the ``data`` axis rides DCN across hosts
while ``tile`` stays within a host's ICI domain (SURVEY.md §2.8 TPU plan).

This module is exercised in CI only via the virtual CPU mesh
(``tests/test_parallel.py``) and the driver's ``dryrun_multichip``; on real
multi-host slices it is the entry point.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """jax.distributed.initialize with env auto-detection (TPU pods fill
    these in automatically; explicit args for GPU/CPU clusters)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_mesh(data: int | None = None, tile: int | None = None) -> Mesh:
    """Mesh over ALL devices (across hosts). Prefer putting the data axis
    across hosts (DCN) and the tile axis within hosts (ICI): gradient
    all-reduce along data is one message per step, while tile-axis
    reductions happen inside every render."""
    devices = jax.devices()
    n = len(devices)
    n_hosts = max(jax.process_count(), 1)
    per_host = n // n_hosts
    if data is None and tile is None:
        data, tile = n_hosts, per_host
    elif data is None:
        data = n // tile
    elif tile is None:
        tile = n // data
    assert data * tile == n, (data, tile, n)
    arr = np.asarray(devices).reshape(data, tile)
    return Mesh(arr, ("data", "tile"))


def is_primary() -> bool:
    return jax.process_index() == 0
