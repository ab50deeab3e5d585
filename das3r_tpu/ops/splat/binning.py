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
    entry_overflow: jax.Array  # [] int32 entries dropped by max_total_entries


def bin_gaussians(prep: Preprocessed, settings: RasterSettings) -> TileBins:
    s = settings
    n = prep.depth.shape[0]
    d_cap = s.max_tiles_per_gaussian

    use_qdepth = (
        s.depth_sort_bits > 0
        and (s.n_tiles + 1) << s.depth_sort_bits <= 2**32)
    if use_qdepth:
        return _bin_quantized_depth(prep, settings)

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
    # Zero ntt for non-binnable rows (mirrors _bin_quantized_depth): they
    # never emit keys, so they must not consume compact-buffer positions or
    # inflate total/entry_overflow.
    ntt = jnp.where(alive_sorted,
                    jnp.minimum(prep.n_tiles_touched[order], d_cap), 0)
    dup_overflow = jnp.sum(
        (prep.n_tiles_touched > d_cap).astype(jnp.int32))

    # Duplication table: entry (i, d) = d-th rect cell of depth-ranked
    # gaussian i. Tile id n_tiles is the out-of-range sentinel.
    d_idx = jnp.arange(d_cap, dtype=jnp.int32)[None, :]   # [1, D]
    # d // width via float: (d + 0.5)/w lies strictly inside
    # (d/w, (d+1)/w) for integer d >= 0, w >= 1, and the f32 error at these
    # magnitudes (< 2^15) is far below the 0.5/w interval margin — integer
    # division on the VPU is much slower than a float multiply.
    row = ((d_idx.astype(jnp.float32) + 0.5)
           / width[:, None].astype(jnp.float32)).astype(jnp.int32)
    col = d_idx - row * width[:, None]
    ty = rect_min[:, 1:2] + row
    tx = rect_min[:, 0:1] + col
    tile = ty * s.tiles_x + tx
    dup_valid = alive_sorted[:, None] & (d_idx < ntt[:, None])
    tile = jnp.where(dup_valid, tile, s.n_tiles).astype(jnp.int32)

    entry_overflow = jnp.zeros((), jnp.int32)

    # Pack (tile, depth-rank) into one uint32 key: a Gaussian touches a
    # tile at most once, so (tile << nbits | depth_rank) is unique and
    # ordering by it equals tile-major depth-minor — a stable sort's result
    # from ONE unstable single-key sort. (The dup-table row index IS the
    # depth rank because rows were re-indexed into depth order above.)
    # The key is SELF-DESCRIBING — gid = order[key & (2^nbits - 1)] — so
    # the sort carries NO payload (half the bitonic data movement of a
    # (key, gid) pair sort) and the gid half of the compaction scatter
    # disappears.
    nbits = max(int(n - 1).bit_length(), 1)
    packable = (s.n_tiles + 1) << nbits <= 2**32
    if packable:
        rank = jax.lax.broadcasted_iota(jnp.uint32, (n, d_cap), 0)
        packed = (tile.astype(jnp.uint32) << nbits) | rank
        sentinel = jnp.uint32(((s.n_tiles + 1) << nbits) - 1)

    use_compact = (s.max_total_entries is not None
                   and n * d_cap > s.full_sort_below)
    if packable and use_compact:
        # Compact the (mostly padding) N*D table into a dense buffer before
        # sorting: typical scenes fill only ~10-20% of the table, and the
        # bitonic sort is the binning bottleneck. Entries beyond the cap
        # belong to the FARTHEST Gaussians (rows are depth-ordered) and are
        # dropped with telemetry.
        e_cap = s.max_total_entries
        base = jnp.cumsum(ntt) - ntt                      # [N] excl. prefix
        pos = base[:, None] + d_idx                       # [N, D]
        in_buf = dup_valid & (pos < e_cap)
        pos = jnp.where(in_buf, pos, e_cap).reshape(-1)
        total = base[-1] + ntt[-1]
        entry_overflow = jnp.maximum(total - e_cap, 0).astype(jnp.int32)
        buf_key = jnp.full((e_cap + 1,), sentinel).at[pos].set(
            jnp.where(in_buf, packed, sentinel).reshape(-1),
            unique_indices=True)[:-1]
        sorted_packed = jax.lax.sort(buf_key, dimension=0)
        n_entries = e_cap
    elif packable:
        sorted_packed = jax.lax.sort(packed.reshape(-1), dimension=0)
        n_entries = n * d_cap
    else:
        flat_gid = jnp.broadcast_to(
            order[:, None].astype(jnp.int32), (n, d_cap)).reshape(-1)
        sorted_tile_arr, sorted_gid = jax.lax.sort(
            (tile.reshape(-1), flat_gid), dimension=0, is_stable=True,
            num_keys=1)
        n_entries = n * d_cap
    slot = jnp.arange(s.max_per_tile, dtype=jnp.int32)[None, :]   # [1, K]
    if packable:
        # One (T+1)-query search gives every tile's [start, end) directly on
        # the raw keys (entries of tile t are < (t+1) << nbits), and the gid
        # mapping composes at [T, K] granularity — no 800k-entry
        # sorted_tile / sorted_gid arrays are ever materialized.
        bounds = jnp.searchsorted(
            sorted_packed,
            jnp.arange(s.n_tiles + 1, dtype=jnp.uint32) << nbits,
            side="left")
        start, end = bounds[:-1], bounds[1:]
        full_count = (end - start).astype(jnp.int32)
        count = jnp.minimum(full_count, s.max_per_tile)
        gather_idx = jnp.clip(start[:, None] + slot, 0, n_entries - 1)
        gid = order.astype(jnp.int32)[
            (sorted_packed[gather_idx]
             & jnp.uint32((1 << nbits) - 1)).astype(jnp.int32)]   # [T, K]
    else:
        tile_ids = jnp.arange(s.n_tiles, dtype=jnp.int32)
        start = jnp.searchsorted(sorted_tile_arr, tile_ids, side="left")
        end = jnp.searchsorted(sorted_tile_arr, tile_ids, side="right")
        full_count = (end - start).astype(jnp.int32)
        count = jnp.minimum(full_count, s.max_per_tile)
        gather_idx = jnp.clip(start[:, None] + slot, 0, n_entries - 1)
        gid = sorted_gid[gather_idx]                       # [T, K]
    return TileBins(gid=gid, count=count, full_count=full_count,
                    dup_overflow=dup_overflow,
                    entry_overflow=entry_overflow)


def _bin_quantized_depth(prep: Preprocessed,
                         settings: RasterSettings) -> TileBins:
    """Fast path: the sort key is (tile << bits | quantized depth), so the
    global depth argsort disappears entirely (the CUDA rasterizer packs
    float depth BITS the same way; we quantize to fit 32 bits next to the
    tile id). Requires ``max_total_entries`` for the compact buffer."""
    s = settings
    n = prep.depth.shape[0]
    d_cap = s.max_tiles_per_gaussian
    bits = s.depth_sort_bits
    e_cap = s.max_total_entries or n * d_cap

    alive = prep.binnable
    depth = jax.lax.stop_gradient(prep.depth)
    dmin = jnp.min(jnp.where(alive, depth, jnp.inf))
    dmax = jnp.max(jnp.where(alive, depth, -jnp.inf))
    scale = (2.0**bits - 1.0) / jnp.maximum(dmax - dmin, 1e-12)
    depth_q = jnp.clip((depth - dmin) * scale, 0, 2.0**bits - 1
                       ).astype(jnp.uint32)

    width = jnp.maximum(prep.rect_max[:, 0] - prep.rect_min[:, 0], 1)
    ntt = jnp.where(alive, jnp.minimum(prep.n_tiles_touched, d_cap), 0)
    dup_overflow = jnp.sum((prep.n_tiles_touched > d_cap).astype(jnp.int32))

    d_idx = jnp.arange(d_cap, dtype=jnp.int32)[None, :]
    ty = prep.rect_min[:, 1:2] + d_idx // width[:, None]
    tx = prep.rect_min[:, 0:1] + d_idx % width[:, None]
    tile = (ty * s.tiles_x + tx).astype(jnp.uint32)
    dup_valid = alive[:, None] & (d_idx < ntt[:, None])
    key = (tile << bits) | depth_q[:, None]
    sentinel = jnp.uint32(((s.n_tiles + 1) << bits) - 1)

    base = jnp.cumsum(ntt) - ntt
    pos = base[:, None] + d_idx
    in_buf = dup_valid & (pos < e_cap)
    pos = jnp.where(in_buf, pos, e_cap).reshape(-1)
    total = base[-1] + ntt[-1]
    entry_overflow = jnp.maximum(total - e_cap, 0).astype(jnp.int32)

    gids = jax.lax.broadcasted_iota(jnp.int32, (n, d_cap), 0).reshape(-1)
    buf_key = jnp.full((e_cap + 1,), sentinel).at[pos].set(
        jnp.where(in_buf, key, sentinel).reshape(-1), unique_indices=True)[:-1]
    buf_gid = jnp.zeros((e_cap + 1,), jnp.int32).at[pos].set(
        gids, unique_indices=True)[:-1]
    sorted_key, sorted_gid = jax.lax.sort(
        (buf_key, buf_gid), dimension=0, num_keys=1)
    sorted_tile = (sorted_key >> bits).astype(jnp.int32)

    tile_ids = jnp.arange(s.n_tiles, dtype=jnp.int32)
    start = jnp.searchsorted(sorted_tile, tile_ids, side="left")
    end = jnp.searchsorted(sorted_tile, tile_ids, side="right")
    full_count = (end - start).astype(jnp.int32)
    count = jnp.minimum(full_count, s.max_per_tile)
    slot = jnp.arange(s.max_per_tile, dtype=jnp.int32)[None, :]
    gather_idx = jnp.clip(start[:, None] + slot, 0, e_cap - 1)
    gid = sorted_gid[gather_idx]
    return TileBins(gid=gid, count=count, full_count=full_count,
                    dup_overflow=dup_overflow,
                    entry_overflow=entry_overflow)
