"""Depth-ordered tile binning — the TPU replacement for the CUDA global
(tileID | depth-bits) radix sort + ``identifyTileRanges`` stage.

Design (SURVEY.md §7 step 2b): instead of a dynamic-size duplicated key list,
we build a STATIC [N * D] duplication table (D = ``max_tiles_per_gaussian``),
stable-sort it by tile id with Gaussians pre-ordered by depth — stability
makes every tile's segment depth-sorted for free — then cut per-tile windows
of capacity K. Overflow policy (documented, checkable from ``TileBins``):

  * a Gaussian touching more than D tiles only lands in the first D rect
    cells (row-major);
  * a tile with more than K Gaussians keeps the K nearest (front-to-back
    blending with the 1e-4 transmittance cutoff makes the truncated tail
    almost always invisible anyway).

Indices are integers: the whole stage sits under ``stop_gradient`` at the
``rasterize`` level; gradients flow through the *gathered values*, not the
gather indices.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from das3r_tpu.ops.splat.preprocess import Preprocessed
from das3r_tpu.ops.splat.settings import RasterSettings


class TileBins(NamedTuple):
    gid: jax.Array        # [T, K] int32 Gaussian index per slot (junk if >= count)
    count: jax.Array      # [T] int32 number of live slots (clamped to K)
    full_count: jax.Array  # [T] int32 pre-truncation count (overflow telemetry)
    dup_overflow: jax.Array  # [] int32 number of Gaussians whose rect was cut by D


def bin_gaussians(prep: Preprocessed, settings: RasterSettings) -> TileBins:
    s = settings
    n = prep.depth.shape[0]
    d_cap = s.max_tiles_per_gaussian

    alive = prep.binnable
    # Global front-to-back order; stable so equal depths keep input order
    # (the CUDA radix sort over float bits is stable too).
    sort_depth = jnp.where(alive, prep.depth, jnp.inf)
    order = jnp.argsort(sort_depth, stable=True)          # [N] gaussian ids

    # Re-index per-gaussian rects into depth order.
    rect_min = prep.rect_min[order]                       # [N, 2]
    rect_max = prep.rect_max[order]
    alive_sorted = alive[order]

    width = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1)
    ntt = jnp.minimum(prep.n_tiles_touched[order], d_cap)
    dup_overflow = jnp.sum(
        (prep.n_tiles_touched > d_cap).astype(jnp.int32))

    # Duplication table: entry (i, d) = d-th rect cell of depth-ranked
    # gaussian i. Tile id n_tiles is the out-of-range sentinel.
    d_idx = jnp.arange(d_cap, dtype=jnp.int32)[None, :]   # [1, D]
    ty = rect_min[:, 1:2] + d_idx // width[:, None]
    tx = rect_min[:, 0:1] + d_idx % width[:, None]
    tile = ty * s.tiles_x + tx
    dup_valid = alive_sorted[:, None] & (d_idx < ntt[:, None])
    tile = jnp.where(dup_valid, tile, s.n_tiles).astype(jnp.int32)

    flat_tile = tile.reshape(-1)                           # [N*D]
    flat_gid = jnp.broadcast_to(
        order[:, None].astype(jnp.int32), (n, d_cap)).reshape(-1)

    # Sort dup entries by tile, depth-stable. When (tile, depth-rank) packs
    # into 32 bits, ONE unstable single-key sort of packed uint32 keys
    # replaces the stable two-array sort: a Gaussian touches a tile at most
    # once, so (tile * N + depth_rank) is unique, and ordering by it equals
    # tile-major, depth-minor — exactly the stable-sort result.
    if (s.n_tiles + 1) * n < 2**32:
        rank = jax.lax.broadcasted_iota(jnp.uint32, (n, d_cap), 0)
        packed = (tile.astype(jnp.uint32) * jnp.uint32(n) + rank
                  ).reshape(-1)
        sorted_packed, sorted_gid = jax.lax.sort(
            (packed, flat_gid), dimension=0, num_keys=1)
        sorted_tile = (sorted_packed // jnp.uint32(n)).astype(jnp.int32)
    else:
        sorted_tile, sorted_gid = jax.lax.sort(
            (flat_tile, flat_gid), dimension=0, is_stable=True, num_keys=1)

    tile_ids = jnp.arange(s.n_tiles, dtype=jnp.int32)
    start = jnp.searchsorted(sorted_tile, tile_ids, side="left")
    end = jnp.searchsorted(sorted_tile, tile_ids, side="right")
    full_count = (end - start).astype(jnp.int32)
    count = jnp.minimum(full_count, s.max_per_tile)

    slot = jnp.arange(s.max_per_tile, dtype=jnp.int32)[None, :]   # [1, K]
    gather_idx = jnp.clip(start[:, None] + slot, 0, n * d_cap - 1)
    gid = sorted_gid[gather_idx]                           # [T, K]
    return TileBins(gid=gid, count=count, full_count=full_count,
                    dup_overflow=dup_overflow)
