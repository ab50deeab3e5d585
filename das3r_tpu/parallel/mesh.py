"""Device-mesh construction for multi-chip training.

The reference's only parallelism is NCCL DDP + rank-sharded sequence lists
(SURVEY.md §2.8). The TPU-native design replaces that with a 2D
``jax.sharding.Mesh``:

  * axis ``data``: frames of the per-step batch (data parallelism — the DDP
    equivalent, gradients all-reduced over ICI by XLA);
  * axis ``tile``: image tiles of each frame (pixel parallelism inside a
    single render — per-Gaussian gradients reduce over ICI at the
    gather-transpose, overlapped by XLA with the blend backward).

On a multi-host slice ``jax.distributed.initialize()`` + the same mesh over
``jax.devices()`` extends this across hosts (DCN boundary along ``data``).
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(data: int | None = None, tile: int | None = None,
              devices=None) -> Mesh:
    """Build a (data, tile) mesh. Defaults: all devices on the tile axis if
    only one axis size is given; (1, n) otherwise."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None and tile is None:
        data, tile = 1, n
    elif data is None:
        data = n // tile
    elif tile is None:
        tile = n // data
    assert data * tile == n, (data, tile, n)
    arr = np.asarray(devices).reshape(data, tile)
    return Mesh(arr, ("data", "tile"))
