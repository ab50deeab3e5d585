"""Depth-ordered tile binning — the TPU replacement for the CUDA global
(tileID | depth-bits) radix sort + ``identifyTileRanges`` stage.

Design (SURVEY.md §7 step 2b): instead of a dynamic-size duplicated key list,
we build a STATIC [N * D] duplication table (D = ``max_tiles_per_gaussian``),
sort it by a packed self-describing (tile << nbits | depth-rank) key — one
unstable single-key sort whose result equals the CUDA stable radix sort —
then cut per-tile windows of capacity K. Overflow policy (documented,
checkable from ``TileBins``):

  * a Gaussian touching more than D tiles only lands in the first D rect
    cells (row-major);
  * a tile with more than K slots keeps the K nearest (front-to-back
    blending with the 1e-4 transmittance cutoff makes the truncated tail
    almost always invisible anyway).

TPU-first details that differ from the CUDA pipeline:

  * **Rank windows, not gid lists.** The output ``rank`` is the per-slot
    depth rank; callers gather attributes from a depth-ordered table
    (``attr[order]``) so the expensive [T, K]-scale ``order[...]``
    composition gather never happens. ``order`` maps rank -> gaussian id.
  * **DMA windows.** Each tile's window [start, start+K) is copied out
    of the sorted key array by a tiny Pallas kernel: double-buffered
    per-tile row DMAs at ``start // 128`` plus an in-kernel dynamic lane
    rotate by ``start % 128`` (``_extract_windows_pallas`` — Mosaic cannot
    DMA at arbitrary *element* offsets, but arbitrary *row* offsets on a
    [E/128, 128] view lower fine). A 128-aligned whole-row-gather variant
    with K+128 padded windows and a per-tile ``delta`` of foreign leading
    entries is kept behind ``settings.use_dma_windows=False``; consumers
    must treat [delta, delta + count) as the live slot range (delta is 0
    on the DMA and per-element paths).
  * **Exact per-pair tile culling** (``settings.tight_binning``): a
    (Gaussian, tile) pair is kept only if the minimum of the conic
    quadratic over the tile's pixel box reaches ``alpha >= 1/255``; pairs
    below that are skipped by the blend kernel at every pixel anyway, so
    dropping them is image- and gradient-exact while shrinking per-tile
    counts (and with them blend-kernel work).

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
    rank: jax.Array       # [T, K] int32 depth rank per window slot (junk
                          # outside [delta, delta + count); clipped to N-1)
    delta: jax.Array      # [T] int32 leading foreign entries per window
    order: jax.Array      # [N] int32 depth rank -> gaussian index
    count: jax.Array      # [T] int32 live slots (at [delta, delta+count))
    full_count: jax.Array  # [T] int32 pre-truncation count (overflow telemetry)
    dup_overflow: jax.Array  # [] int32 Gaussians whose rect was cut by D
    entry_overflow: jax.Array  # [] int32 entries past max_total_entries
    #                            (dropped on the capacity-bound compact /
    #                            entry-stream paths; telemetry-only on the
    #                            exact full-sort path)
    heavy_overflow: jax.Array  # [] int32 entries dropped because more than
    #                            heavy_rows_cap Gaussians outgrew the
    #                            split table's light width (0 when the
    #                            split table is off). Counts RECT cells of
    #                            the dropped rows: with tight_binning this
    #                            upper-bounds the live entries lost (the
    #                            per-pair cull would have removed some),
    #                            exact otherwise — same convention as
    #                            dup_overflow.


def gids(bins: TileBins) -> jax.Array:
    """[T, K] Gaussian index per slot (junk outside the live range)."""
    return bins.order[bins.rank]


def _pad128(keys: jax.Array, sentinel, extra: int = 0) -> jax.Array:
    """Pad a 1-D key array with ``extra`` sentinels then up to a multiple
    of 128 (done BEFORE the sort so the pad costs no extra pass —
    sentinels sort last). ``extra`` = window capacity lets window reads at
    any start stay in bounds without clamping."""
    e = keys.shape[0]
    pad = extra + (-(e + extra)) % 128
    if pad:
        keys = jnp.concatenate(
            [keys, jnp.full((pad,), sentinel, keys.dtype)])
    return keys


def _extract_windows_pallas(sorted_keys: jax.Array, start: jax.Array,
                            k_cap: int) -> jax.Array:
    """[T, K] windows at EXACT (element-granular) starts: row-DMA + rotate.

    Mosaic cannot DMA-slice an HBM ref at an arbitrary dynamic *element*
    offset (the tile-divisibility proof fails on the minor dim), but an
    arbitrary dynamic *row* offset on a [E/128, 128] view is fine. So each
    tile copies the K/128 + 1 rows covering [start, start + K) into VMEM
    (double-buffered: tile t's copy was issued during tile t-1's step) and
    the kernel rotates lanes by ``delta = start % 128``, stitching row r
    with row r+1 to realign the window to element granularity:

        out[r, c] = buf[r + (c + delta) // 128, (c + delta) % 128]
                  = where(c < 128 - delta, A[r], A[r + 1]),
          A = roll(buf, -delta, lanes)

    The sorted key array carries >= K + 128 trailing sentinels (``_pad128``
    ``extra``), so the row read never leaves bounds."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_tiles = start.shape[0]
    rows = k_cap // 128
    keys2d = sorted_keys.reshape(-1, 128)

    def kernel(start_ref, keys_ref, out_ref, buf, sems):
        t = pl.program_id(0)

        def dma(slot, ti):
            return pltpu.make_async_copy(
                keys_ref.at[pl.ds(start_ref[ti] // 128, rows + 1)],
                buf.at[slot], sems.at[slot])

        @pl.when(t == 0)
        def _():
            dma(0, 0).start()

        @pl.when(t + 1 < t_tiles)
        def _():
            dma((t + 1) % 2, t + 1).start()

        dma(t % 2, t).wait()
        delta = start_ref[t] % 128
        a = pltpu.roll(buf[t % 2], -delta, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        out_ref[...] = jnp.where(lane < 128 - delta, a[:rows], a[1:])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((None, rows, 128), lambda t, s: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rows + 1, 128), sorted_keys.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_tiles, rows, 128),
                                       sorted_keys.dtype),
        interpret=jax.default_backend() != "tpu",
    )(start.astype(jnp.int32), keys2d)
    return out.reshape(t_tiles, k_cap)


def _windows(sorted_keys: jax.Array, boundaries: jax.Array, k_cap: int,
             use_dma: bool = True):
    """Cut per-tile [start, start + K) windows from a sorted key array.

    ``boundaries`` are the T+1 key values delimiting tiles. Three
    implementations, all with identical semantics (count =
    min(full_count, K) nearest entries):

      * DMA path (TPU default): a Pallas kernel row-DMAs each window's
        128-row span and lane-rotates it to the EXACT element offset — the
        array carries >= K + 128 trailing sentinels so no clamping is
        needed; ``delta`` is 0.
      * aligned row-gather (``use_dma=False``): windows start at the
        previous multiple of 128 and extraction is a whole-row gather of
        K + 128 entries; the up-to-127 foreign leading entries are
        reported in ``delta`` and masked by the blend kernels.
      * per-element gather: exact starts via XLA gather (small K / CPU).

    Returns (win [T, K or K+128], delta, count, full_count)."""
    e = sorted_keys.shape[0]
    bounds = jnp.searchsorted(sorted_keys, boundaries, side="left")
    start, end = bounds[:-1], bounds[1:]
    full_count = (end - start).astype(jnp.int32)
    t = start.shape[0]
    k_pad = k_cap + 128
    aligned_ok = k_cap % 128 == 0 and e % 128 == 0 and e >= k_pad
    if aligned_ok and use_dma and jax.default_backend() == "tpu":
        delta = jnp.zeros((t,), jnp.int32)
        win = _extract_windows_pallas(sorted_keys, start, k_cap)
    elif aligned_ok and not use_dma:
        start_al = jnp.minimum((start // 128) * 128, e - k_pad)
        delta = jnp.where(full_count > 0,
                          (start - start_al).astype(jnp.int32), 0)
        rows = sorted_keys.reshape(e // 128, 128)
        widx = (start_al // 128)[:, None] + jnp.arange(
            k_pad // 128, dtype=start_al.dtype)[None, :]
        win = rows[widx].reshape(t, k_pad)
    else:
        delta = jnp.zeros((t,), jnp.int32)
        slot = jnp.arange(k_cap, dtype=jnp.int32)[None, :]
        gidx = jnp.clip(start[:, None] + slot, 0, e - 1)
        win = sorted_keys[gidx]
    count = jnp.minimum(full_count, k_cap).astype(jnp.int32)
    return win, delta, count, full_count


def _tile_pair_keep(prep_sorted_mean2d, prep_sorted_conic, q_cap_sorted,
                    tx, ty, settings: RasterSettings):
    """Exact per-(Gaussian, tile) cull: keep iff the minimum of the conic
    quadratic q(d) = A dx^2 + 2B dx dy + C dy^2 over the tile's pixel box
    satisfies alpha = op * exp(-q/2) >= alpha_floor, i.e. q_min <= q_cap.

    The box min of a PSD quadratic is 0 if the center lies inside, else the
    min over the four edges (each a clamped 1-D quadratic minimum). The
    continuous-box minimum lower-bounds the kernel's integer-pixel minimum,
    so culling is conservative-exact (never drops a contributing pair).
    """
    s = settings
    mx = prep_sorted_mean2d[:, 0:1]
    my = prep_sorted_mean2d[:, 1:2]
    A = prep_sorted_conic[:, 0:1]
    B = prep_sorted_conic[:, 1:2]
    C = prep_sorted_conic[:, 2:3]
    A_safe = jnp.where(A > 0, A, 1.0)
    C_safe = jnp.where(C > 0, C, 1.0)

    lx = tx.astype(jnp.float32) * s.tile - mx            # [N, D]
    hx = lx + (s.tile - 1)
    ly = ty.astype(jnp.float32) * s.tile - my
    hy = ly + (s.tile - 1)
    inside = (lx <= 0) & (hx >= 0) & (ly <= 0) & (hy >= 0)

    def q_edge_x(xh):
        yst = jnp.clip(-B * xh / C_safe, ly, hy)
        return A * xh * xh + 2.0 * B * xh * yst + C * yst * yst

    def q_edge_y(yh):
        xst = jnp.clip(-B * yh / A_safe, lx, hx)
        return A * xst * xst + 2.0 * B * xst * yh + C * yh * yh

    q_min = jnp.minimum(
        jnp.minimum(q_edge_x(lx), q_edge_x(hx)),
        jnp.minimum(q_edge_y(ly), q_edge_y(hy)))
    q_min = jnp.where(inside, 0.0, q_min)
    return q_min <= q_cap_sorted[:, None] + 1e-3


class SortedKeyStream(NamedTuple):
    """Result of the shared dup-table + sort stage (packable path only)."""
    sorted_packed: jax.Array   # [E_sort] uint32, (tile << nbits | rank) keys
    order: jax.Array           # [N] int32 depth rank -> gaussian index
    boundaries: jax.Array      # [T + 1] uint32 key values delimiting tiles
    nbits: int                 # rank bit width; rank = key & (2^nbits - 1)
    sentinel: jax.Array        # uint32 sentinel key (sorts last)
    dup_overflow: jax.Array
    entry_overflow: jax.Array
    heavy_overflow: jax.Array


def _sorted_key_stream(prep: Preprocessed,
                       settings: RasterSettings) -> SortedKeyStream | None:
    """Duplication table -> packed self-describing keys -> one sort.

    Returns None when (n_tiles + 1) << nbits exceeds 32 bits (callers fall
    back to the pair-sort path)."""
    s = settings
    n = prep.depth.shape[0]
    d_cap = s.max_tiles_per_gaussian
    nbits = max(int(n - 1).bit_length(), 1)
    if (s.n_tiles + 1) << nbits > 2**32:
        return None

    alive = prep.binnable
    # Global front-to-back order; stable so equal depths keep input order
    # (the CUDA radix sort over float bits is stable too).
    sort_depth = jnp.where(alive, prep.depth, jnp.inf)
    order = jnp.argsort(sort_depth, stable=True)          # [N] gaussian ids
    order = order.astype(jnp.int32)

    # Re-index the per-gaussian emit inputs into depth order with ONE
    # packed [N, 10] gather: seven separate gathers each pay the full
    # per-row gather constant (~8.5 ns/row — at 1.5M rows they were
    # ~90 ms/iter, round-4 profile), while one packed row costs it once.
    # Small ints are exact in f32 (all < 2^24); ntt is pre-zeroed for
    # non-binnable rows so no alive gather is needed downstream.
    width_o = jnp.maximum(prep.rect_max[:, 0] - prep.rect_min[:, 0], 1)
    ntt_o = jnp.where(alive,
                      jnp.minimum(prep.n_tiles_touched, d_cap), 0)
    pack = jax.lax.optimization_barrier(jnp.concatenate([
        prep.rect_min.astype(jnp.float32),                # 0:2 rect_min
        width_o.astype(jnp.float32)[:, None],             # 2   width
        ntt_o.astype(jnp.float32)[:, None],               # 3   ntt
        jax.lax.stop_gradient(prep.mean2d),               # 4:6
        prep.conic,                                       # 6:9
        prep.q_cap[:, None],                              # 9
    ], axis=1))[order]
    rect_min = pack[:, 0:2].astype(jnp.int32)             # [N, 2]
    width = pack[:, 2].astype(jnp.int32)
    ntt = pack[:, 3].astype(jnp.int32)
    m2d_s = pack[:, 4:6]
    conic_s = pack[:, 6:9]
    qcap_s = pack[:, 9]
    dup_overflow = jnp.sum(
        (prep.n_tiles_touched > d_cap).astype(jnp.int32))

    sentinel = jnp.uint32(((s.n_tiles + 1) << nbits) - 1)
    boundaries = (jnp.arange(s.n_tiles + 1, dtype=jnp.uint32) << nbits)

    def emit_keys(w, rmn, nt, m2d, con, qc, rank_vals, d0, d_width):
        """Packed (tile << nbits | rank) keys for rect cells
        [d0, d0 + d_width) of depth-ordered rows described by the given
        per-row arrays (width, rect_min, live cell count; tight-binning
        inputs). Invalid cells get tile = n_tiles (sorts past every
        boundary). Returns (packed [R, d_width] uint32, valid mask)."""
        d_idx = d0 + jnp.arange(d_width, dtype=jnp.int32)[None, :]
        # d // width via float: see the note in the full-width path below.
        rowq = ((d_idx.astype(jnp.float32) + 0.5)
                / w[:, None].astype(jnp.float32)).astype(jnp.int32)
        col = d_idx - rowq * w[:, None]
        ty = rmn[:, 1:2] + rowq
        tx = rmn[:, 0:1] + col
        tile = ty * s.tiles_x + tx
        valid = d_idx < nt[:, None]
        if s.tight_binning:
            valid = valid & _tile_pair_keep(m2d, con, qc, tx, ty, s)
        tile = jnp.where(valid, tile, s.n_tiles).astype(jnp.int32)
        packed = (tile.astype(jnp.uint32) << nbits) | rank_vals
        return packed, valid

    if (s.heavy_rows_cap is not None and 0 < s.light_dup_width < d_cap):
        # ---- split-width duplication table (settings.py rationale): all
        # rows emit their first L cells into [N, L]; rows with more tiles
        # are compacted depth-first into [H_cap, D - L] for the rest.
        L = s.light_dup_width
        h_cap = s.heavy_rows_cap
        heavy = ntt > L                                    # [N] (0 if dead)
        h_pos = jnp.cumsum(heavy.astype(jnp.int32)) - heavy
        in_h = heavy & (h_pos < h_cap)
        row_iota = jnp.arange(n, dtype=jnp.int32)
        hid = jnp.full((h_cap + 1,), n, jnp.int32).at[
            jnp.where(in_h, h_pos, h_cap)].set(
            jnp.where(in_h, row_iota, n), unique_indices=True)[:-1]
        # over-cap heavy rows (the FARTHEST: h_pos is depth-ordered) keep
        # their first L entries via the light table and drop the rest
        heavy_overflow = jnp.sum(
            jnp.where(heavy & ~in_h, ntt - L, 0)).astype(jnp.int32)

        rank_l = jax.lax.broadcasted_iota(jnp.uint32, (n, L), 0)
        packed_l, valid_l = emit_keys(
            width, rect_min, ntt, m2d_s, conic_s, qcap_s, rank_l, 0, L)

        hvalid = hid < n
        hc = jnp.minimum(hid, n - 1)
        rank_h = jnp.where(hvalid, hid, 0).astype(jnp.uint32)[:, None]
        packed_h, valid_h = emit_keys(
            width[hc], rect_min[hc], jnp.where(hvalid, ntt[hc], 0),
            m2d_s[hc], conic_s[hc], qcap_s[hc], rank_h, L, d_cap - L)

        all_packed = jnp.concatenate(
            [packed_l.reshape(-1), packed_h.reshape(-1)])
        if s.max_total_entries is not None:
            total = (jnp.sum(valid_l.astype(jnp.int32))
                     + jnp.sum(valid_h.astype(jnp.int32)))
            entry_overflow = jnp.maximum(
                total - s.max_total_entries, 0).astype(jnp.int32)
        sorted_packed = jax.lax.sort(
            _pad128(all_packed, sentinel, extra=s.max_per_tile + 128),
            dimension=0)
        return SortedKeyStream(
            sorted_packed=sorted_packed, order=order, boundaries=boundaries,
            nbits=nbits, sentinel=sentinel, dup_overflow=dup_overflow,
            entry_overflow=(entry_overflow
                            if s.max_total_entries is not None
                            else jnp.zeros((), jnp.int32)),
            heavy_overflow=heavy_overflow)

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
    # ntt is pre-zeroed for non-binnable rows (packed gather above)
    dup_valid = d_idx < ntt[:, None]
    if s.tight_binning:
        dup_valid = dup_valid & _tile_pair_keep(m2d_s, conic_s, qcap_s,
                                                tx, ty, s)
    tile = jnp.where(dup_valid, tile, s.n_tiles).astype(jnp.int32)

    entry_overflow = jnp.zeros((), jnp.int32)

    # Pack (tile, depth-rank) into one uint32 key: a Gaussian touches a
    # tile at most once, so (tile << nbits | depth_rank) is unique and
    # ordering by it equals tile-major depth-minor — a stable sort's result
    # from ONE unstable single-key sort. (The dup-table row index IS the
    # depth rank because rows were re-indexed into depth order above.)
    # The key is SELF-DESCRIBING — rank = key & (2^nbits - 1) — so the sort
    # carries NO payload and the windows directly yield depth ranks.
    rank_iota = jax.lax.broadcasted_iota(jnp.uint32, (n, d_cap), 0)
    packed = (tile.astype(jnp.uint32) << nbits) | rank_iota

    use_compact = (s.max_total_entries is not None
                   and n * d_cap > s.full_sort_below)
    if use_compact:
        # Compact the (mostly padding) N*D table into a dense buffer before
        # sorting: at production scale the 4B*N*D table's memory argues for
        # it. Entries beyond the cap belong to the FARTHEST Gaussians (rows
        # are depth-ordered) and are dropped with telemetry.
        e_cap = s.max_total_entries
        live = dup_valid
        pos_in_row = jnp.cumsum(live.astype(jnp.int32), axis=1) - live
        ntt_live = pos_in_row[:, -1] + live[:, -1]
        base = jnp.cumsum(ntt_live) - ntt_live            # [N] excl. prefix
        pos = base[:, None] + pos_in_row                  # [N, D]
        in_buf = live & (pos < e_cap)
        pos = jnp.where(in_buf, pos, e_cap).reshape(-1)
        total = base[-1] + ntt_live[-1]
        entry_overflow = jnp.maximum(total - e_cap, 0).astype(jnp.int32)
        buf_key = jnp.full((e_cap + 1,), sentinel).at[pos].set(
            jnp.where(in_buf, packed, sentinel).reshape(-1),
            unique_indices=True)[:-1]
        sorted_packed = jax.lax.sort(
            _pad128(buf_key, sentinel, extra=s.max_per_tile + 128), dimension=0)
    else:
        sorted_packed = jax.lax.sort(
            _pad128(packed.reshape(-1), sentinel, extra=s.max_per_tile + 128),
            dimension=0)
        if s.max_total_entries is not None:
            # The full sort drops nothing, but the cap-exceedance telemetry
            # must still fire: max_total_entries sizes the TPU entry stream
            # (and the compact buffer above), and the trainer's auto-regrow
            # watches this signal — the CPU/XLA full-sort path has to report
            # the same "scene outgrew its probed capacity" condition so the
            # regrow logic is exercised identically off-TPU.
            total = jnp.sum(dup_valid.astype(jnp.int32))
            entry_overflow = jnp.maximum(
                total - s.max_total_entries, 0).astype(jnp.int32)
    return SortedKeyStream(sorted_packed=sorted_packed, order=order,
                           boundaries=boundaries, nbits=nbits,
                           sentinel=sentinel, dup_overflow=dup_overflow,
                           entry_overflow=entry_overflow,
                           heavy_overflow=jnp.zeros((), jnp.int32))


def bin_gaussians(prep: Preprocessed, settings: RasterSettings) -> TileBins:
    s = settings
    n = prep.depth.shape[0]
    d_cap = s.max_tiles_per_gaussian

    use_qdepth = (
        s.depth_sort_bits > 0
        and (s.n_tiles + 1) << s.depth_sort_bits <= 2**32)
    if use_qdepth:
        return _bin_quantized_depth(prep, settings)

    ks = _sorted_key_stream(prep, settings)
    if ks is not None:
        mask = jnp.uint32((1 << ks.nbits) - 1)
        win, delta, count, full_count = _windows(
            ks.sorted_packed, ks.boundaries, s.max_per_tile,
            use_dma=s.use_dma_windows)
        rank = jnp.minimum((win & mask).astype(jnp.int32), n - 1)
        return TileBins(rank=rank, delta=delta, order=ks.order, count=count,
                        full_count=full_count, dup_overflow=ks.dup_overflow,
                        entry_overflow=ks.entry_overflow,
                        heavy_overflow=ks.heavy_overflow)

    # Fallback for key spaces over 32 bits: stable (tile, rank) pair sort.
    alive = prep.binnable
    sort_depth = jnp.where(alive, prep.depth, jnp.inf)
    order = jnp.argsort(sort_depth, stable=True).astype(jnp.int32)
    rect_min = prep.rect_min[order]
    rect_max = prep.rect_max[order]
    alive_sorted = alive[order]
    width = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1)
    ntt = jnp.where(alive_sorted,
                    jnp.minimum(prep.n_tiles_touched[order], d_cap), 0)
    dup_overflow = jnp.sum(
        (prep.n_tiles_touched > d_cap).astype(jnp.int32))
    d_idx = jnp.arange(d_cap, dtype=jnp.int32)[None, :]
    row = ((d_idx.astype(jnp.float32) + 0.5)
           / width[:, None].astype(jnp.float32)).astype(jnp.int32)
    col = d_idx - row * width[:, None]
    ty = rect_min[:, 1:2] + row
    tx = rect_min[:, 0:1] + col
    tile = ty * s.tiles_x + tx
    dup_valid = alive_sorted[:, None] & (d_idx < ntt[:, None])
    if s.tight_binning:
        dup_valid = dup_valid & _tile_pair_keep(
            jax.lax.stop_gradient(prep.mean2d)[order],
            prep.conic[order], prep.q_cap[order], tx, ty, s)
    tile = jnp.where(dup_valid, tile, s.n_tiles).astype(jnp.int32)
    flat_rank = jax.lax.broadcasted_iota(
        jnp.int32, (n, d_cap), 0).reshape(-1)
    sorted_tile_arr, sorted_rank = jax.lax.sort(
        (tile.reshape(-1), flat_rank), dimension=0, is_stable=True,
        num_keys=1)
    tile_ids = jnp.arange(s.n_tiles + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(sorted_tile_arr, tile_ids, side="left")
    start, end = bounds[:-1], bounds[1:]
    full_count = (end - start).astype(jnp.int32)
    count = jnp.minimum(full_count, s.max_per_tile)
    delta = jnp.zeros((s.n_tiles,), jnp.int32)
    slot = jnp.arange(s.max_per_tile, dtype=jnp.int32)[None, :]
    gather_idx = jnp.clip(start[:, None] + slot, 0, n * d_cap - 1)
    rank = jnp.minimum(sorted_rank[gather_idx], n - 1)
    return TileBins(rank=rank, delta=delta, order=order, count=count,
                    full_count=full_count, dup_overflow=dup_overflow,
                    entry_overflow=jnp.zeros((), jnp.int32),
                    heavy_overflow=jnp.zeros((), jnp.int32))


class EntryStream(NamedTuple):
    """128-aligned variable-length per-tile entry stream (no K cap).

    The sorted (tile-major, depth-minor) entry sequence is laid out with
    each tile's segment starting at a 128-multiple, so every 128-chunk
    belongs to exactly ONE tile — the entry-stream blend kernels walk the
    chunks sequentially, carrying per-tile pixel state across chunk
    boundaries, with NO per-tile capacity and therefore NO truncation
    (the CUDA reference's exact semantics; SURVEY.md §2.9). Work scales
    with the actual entry count, not tiles x max-occupancy."""
    rank: jax.Array        # [E_al] int32 depth rank per slot; n on pad slots
    chunk_tile: jax.Array  # [E_al/128] int32 owning tile (n_tiles when void)
    order: jax.Array       # [N] int32 depth rank -> gaussian index
    count: jax.Array       # [T] int32 live entries per tile (uncapped)
    dup_overflow: jax.Array
    entry_overflow: jax.Array
    heavy_overflow: jax.Array


def entry_stream_supported(n: int, settings: RasterSettings) -> bool:
    """Static predicate: the entry-stream path needs the packable
    single-key sort and a set ``max_total_entries`` (it sizes the static
    stream — an unbounded N * D stream would be a memory hazard)."""
    nbits = max(int(n - 1).bit_length(), 1)
    return (settings.max_total_entries is not None
            and (settings.n_tiles + 1) << nbits <= 2**32)


def entry_stream_cap(settings: RasterSettings, n: int) -> int:
    """Static aligned-stream capacity: ``max_total_entries`` rounded to the
    kernel block size (the per-scene probe in models/autosize.py already
    measures the ALIGNED total, padding included; tiles crossing the cap
    lose their tail with entry_overflow telemetry)."""
    s = settings
    e = n * s.max_tiles_per_gaussian + 128 * s.n_tiles
    if s.max_total_entries is not None:
        e = min(e, s.max_total_entries)
    return -(-e // 1024) * 1024


def _extract_chunks_pallas(keys2d: jax.Array, src_row: jax.Array,
                           delta: jax.Array) -> jax.Array:
    """[n_chunks, 128] stream chunks: chunk c = 128 sorted keys starting at
    element ``src_row[c] * 128 + delta[c]`` (``delta`` < 128). Same row-DMA
    + lane-rotate trick as ``_extract_windows_pallas`` but chunk-granular:
    each grid step loads 8 chunks' 2-row spans (double-buffered against the
    next step) and stitches them with a dynamic roll. An XLA per-element
    gather of the same stream measured ~7 ms at 900k slots; this is ~bandwidth.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_chunks = src_row.shape[0]
    assert n_chunks % 8 == 0, n_chunks
    grid = n_chunks // 8

    def kernel(src_ref, delta_ref, keys_ref, out_ref, buf, sems):
        g = pl.program_id(0)

        def dma(slot, c):
            return pltpu.make_async_copy(
                keys_ref.at[pl.ds(src_ref[c], 2)],
                buf.at[slot, c % 8], sems.at[slot, c % 8])

        @pl.when(g == 0)
        def _():
            for j in range(8):
                dma(0, j).start()

        @pl.when(g + 1 < grid)
        def _():
            for j in range(8):
                dma((g + 1) % 2, (g + 1) * 8 + j).start()

        lane = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
        for j in range(8):
            c = g * 8 + j
            dma(g % 2, c).wait()
            d = delta_ref[c]
            a = pltpu.roll(buf[g % 2, j], -d, 1)
            out_ref[j, :] = jnp.where(lane < 128 - d, a, 0)[0, :] | \
                jnp.where(lane >= 128 - d, a, 0)[1, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((8, 128), lambda g, s, d: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 8, 2, 128), keys2d.dtype),
            pltpu.SemaphoreType.DMA((2, 8)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks, 128), keys2d.dtype),
        interpret=jax.default_backend() != "tpu",
    )(src_row.astype(jnp.int32), delta.astype(jnp.int32), keys2d)


def entry_stream_from_keys(ks: SortedKeyStream, settings: RasterSettings,
                           n: int, e_al: int, tile0=0,
                           t_loc: int | None = None) -> EntryStream:
    """Lay out the 128-aligned entry stream for tiles
    [tile0, tile0 + t_loc) from an already-sorted key stream.

    ``tile0`` may be a traced scalar (tile-sharded callers pass
    ``axis_index * t_loc`` inside ``shard_map``); ``t_loc`` and ``e_al``
    are static. ``chunk_tile`` carries LOCAL tile indices (void = t_loc) —
    the blend kernels recover global pixel coordinates from ``tile0``.
    The whole-image case is tile0 = 0, t_loc = settings.n_tiles."""
    s = settings
    if t_loc is None:
        t_loc = s.n_tiles
    keys = ks.sorted_packed

    # Local boundary key values: tile ids beyond the image (tile-count
    # padding on the last shard) clamp to the global sentinel boundary,
    # giving those tiles empty [start, end) ranges.
    tile0 = jnp.asarray(tile0, jnp.uint32)
    local_ids = jnp.minimum(tile0 + jnp.arange(t_loc + 1, dtype=jnp.uint32),
                            jnp.uint32(s.n_tiles))
    boundaries = local_ids << ks.nbits
    bounds = jnp.searchsorted(keys, boundaries, side="left")
    start, end = bounds[:-1], bounds[1:]
    count_raw = (end - start).astype(jnp.int32)              # [t_loc] uncapped
    ccount = ((count_raw + 127) // 128) * 128
    astart = jnp.cumsum(ccount) - ccount                     # [t_loc]
    total = astart[-1] + ccount[-1]
    # Tiles whose aligned segment crosses the static stream capacity lose
    # their tail (reported via entry_overflow) — the same farthest-first
    # drop policy as the compact sort buffer.
    count = jnp.clip(count_raw, 0, jnp.maximum(e_al - astart, 0))
    stream_drop = jnp.sum(count_raw - count)

    # Per-CHUNK owning tile, built with tile-scale ops only (a per-slot
    # searchsorted over [e_al] queries measured ~80 ms on TPU): scatter
    # each tile's id at its first chunk, then forward-fill with a running
    # max. Tiles sharing a start chunk form an empty-then-nonempty run, so
    # the max picks the owner (the one whose segment has width).
    n_chunks = e_al // 128
    first_chunk = jnp.minimum(astart // 128, n_chunks - 1)
    # empty tiles scatter the neutral 0 (their astart may alias the clipped
    # last chunk when the stream is full); chunk 0's owner is found anyway
    # because the forward-fill starts at 0 and void chunks are masked below
    tile_iota = jnp.arange(t_loc, dtype=jnp.int32)
    marks = jnp.zeros((n_chunks,), jnp.int32).at[first_chunk].max(
        jnp.where(count > 0, tile_iota, 0))
    owner = jax.lax.associative_scan(jnp.maximum, marks)     # [n_chunks]
    chunk_ids = jnp.arange(n_chunks, dtype=jnp.int32)
    chunk_live = chunk_ids * 128 < total
    chunk_tile = jnp.where(chunk_live, owner, t_loc).astype(jnp.int32)

    # Per-slot sorted-array source position: chunk c's 128 keys start at
    # cbase[c] + c*128 (cbase = start - astart of the owning tile). The
    # keys are pulled by a chunk-granular row-DMA + rotate kernel; only
    # tile-scale and chunk-scale gathers remain (an XLA per-element gather
    # here measured ~7 ms at 900k slots).
    cbase = start[owner] - astart[owner]                     # [n_chunks]
    ccount_b = count[owner]
    coff = chunk_ids * 128 - astart[owner]                   # slot 0 offset
    lane = jnp.arange(128, dtype=jnp.int32)[None, :]
    off = coff[:, None] + lane                               # [n_chunks, 128]
    live = chunk_live[:, None] & (off < ccount_b[:, None])
    src0 = jnp.clip(cbase + chunk_ids * 128, 0, keys.shape[0] - 256)
    win = _extract_chunks_pallas(keys.reshape(-1, 128),
                                 src0 // 128, src0 % 128)    # [n_chunks, 128]
    mask = jnp.uint32((1 << ks.nbits) - 1)
    rank = jnp.where(live,
                     jnp.minimum((win & mask).astype(jnp.int32), n - 1),
                     n).reshape(-1)
    return EntryStream(rank=rank, chunk_tile=chunk_tile, order=ks.order,
                       count=count, dup_overflow=ks.dup_overflow,
                       entry_overflow=ks.entry_overflow + stream_drop,
                       heavy_overflow=ks.heavy_overflow)


def bin_entry_stream(prep: Preprocessed,
                     settings: RasterSettings) -> EntryStream:
    s = settings
    n = prep.depth.shape[0]
    ks = _sorted_key_stream(prep, settings)
    if ks is None:
        raise ValueError(
            "entry-stream binning needs (n_tiles + 1) << ceil(log2 N) to "
            "fit 32 bits; use the [T, K] window path for this geometry")
    return entry_stream_from_keys(ks, s, n, entry_stream_cap(s, n))


def _bin_quantized_depth(prep: Preprocessed,
                         settings: RasterSettings) -> TileBins:
    """Fast path: the sort key is (tile << bits | quantized depth), so the
    global depth argsort disappears entirely (the CUDA rasterizer packs
    float depth BITS the same way; we quantize to fit 32 bits next to the
    tile id). Requires ``max_total_entries`` for the compact buffer.

    Contract note: here the sorted payload is the gaussian id itself, so
    ``rank`` IS the gaussian index and ``order`` is the identity."""
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

    gid_iota = jax.lax.broadcasted_iota(jnp.int32, (n, d_cap), 0).reshape(-1)
    buf_key = jnp.full((e_cap + 1,), sentinel).at[pos].set(
        jnp.where(in_buf, key, sentinel).reshape(-1), unique_indices=True)[:-1]
    buf_gid = jnp.zeros((e_cap + 1,), jnp.int32).at[pos].set(
        gid_iota, unique_indices=True)[:-1]
    sorted_key, sorted_gid = jax.lax.sort(
        (buf_key, buf_gid), dimension=0, num_keys=1)
    sorted_tile = (sorted_key >> bits).astype(jnp.int32)

    tile_ids = jnp.arange(s.n_tiles + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(sorted_tile, tile_ids, side="left")
    start, end = bounds[:-1], bounds[1:]
    full_count = (end - start).astype(jnp.int32)
    count = jnp.minimum(full_count, s.max_per_tile)
    delta = jnp.zeros((s.n_tiles,), jnp.int32)
    slot = jnp.arange(s.max_per_tile, dtype=jnp.int32)[None, :]
    gather_idx = jnp.clip(start[:, None] + slot, 0, e_cap - 1)
    rank = jnp.minimum(sorted_gid[gather_idx], n - 1)
    return TileBins(rank=rank, delta=delta,
                    order=jnp.arange(n, dtype=jnp.int32), count=count,
                    full_count=full_count, dup_overflow=dup_overflow,
                    entry_overflow=entry_overflow,
                    heavy_overflow=jnp.zeros((), jnp.int32))
