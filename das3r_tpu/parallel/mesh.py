"""Device-mesh construction for multi-chip training.

The reference's only parallelism is NCCL DDP + rank-sharded sequence lists
(SURVEY.md §2.8). The TPU-native design replaces that with a 3D
``jax.sharding.Mesh``:

  * axis ``data``: frames of the per-step batch (data parallelism — the DDP
    equivalent, gradients all-reduced over ICI by XLA);
  * axis ``gauss``: the Gaussian/primitive axis — params, Adam state and
    preprocessing sharded N-ways (model parallelism over primitives). The
    per-Gaussian screen-space quantities are all-gathered before binning
    (they are ~10x smaller than params+optimizer state) and the transpose
    of that gather reduce-scatters per-Gaussian gradients back to shards.
    This is what lifts the single-chip Gaussian-count ceiling (BASELINE
    config[4]: 5M-Gaussian scenes).
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
              gauss: int | None = None, devices=None) -> Mesh:
    """Build a (data, gauss, tile) mesh. Unspecified axes default so the
    product covers all devices: with nothing given, everything goes on
    ``tile``; with exactly one axis missing, it absorbs the remainder."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None and tile is None and gauss is None:
        data, gauss, tile = 1, 1, n
    else:
        known = [x for x in (data, gauss, tile) if x is not None]
        rem = n // max(1, int(np.prod(known)))
        if data is None:
            data = rem if (gauss is not None and tile is not None) else 1
        if gauss is None:
            gauss = rem if tile is not None else 1
        if tile is None:
            tile = n // (data * gauss)
    assert data * gauss * tile == n, (data, gauss, tile, n)
    arr = np.asarray(devices).reshape(data, gauss, tile)
    return Mesh(arr, ("data", "gauss", "tile"))
