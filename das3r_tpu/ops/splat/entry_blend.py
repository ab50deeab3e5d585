"""Entry-stream Pallas blend kernels: variable-length per-tile lists.

The [T, K] window kernels (``pallas_blend.py``) pay for tiles x K slots
even though per-tile occupancy is heavily skewed, and TRUNCATE tiles
beyond K — a capacity semantics the CUDA reference does not have
(diff-gaussian-rasterization keeps every (Gaussian, tile) pair;
SURVEY.md §2.9). These kernels instead walk ``binning.bin_entry_stream``'s
128-aligned entry stream: every 128-chunk belongs to exactly one tile, the
sequential grid carries the current tile's pixel state (accumulated color,
transmittance) in VMEM scratch across chunk boundaries, and a finished
tile is flushed to HBM with a dynamic-row DMA. Work and memory scale with
the ACTUAL entry count; there is no per-tile capacity at all.

Forward outputs are bg-free: ``cpre`` (premultiplied color) and ``tfinal``
(final transmittance); the caller composes ``cpre + tfinal * bg`` in XLA so
background gradients ride ordinary autodiff and empty tiles (never flushed
— their HBM rows stay uninitialized) are masked with ``count > 0``.

The backward runs the grid REVERSED, replaying each chunk from the saved
per-chunk entry transmittance (``tin``) with the CUDA-style suffix
accumulator S_i = sum_{j>i} (g . c_j) w_j + gT * T_final, where gT is the
cotangent of ``tfinal`` (the bg term of the original derivation arrives
through the external composition). Per-entry gradients land in entry-major
[9, E_al] blocks — static shapes, no dynamic writes — and the caller
scatter-adds them per Gaussian.

Attribute row order matches pallas_blend.py:
    0: mean2d_x  1: mean2d_y  2: conic_xx  3: conic_xy  4: conic_yy
    5: color_r   6: color_g   7: color_b   8: opacity
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from das3r_tpu.ops.splat.pallas_blend import (
    N_ATTR, _interpret, _lane_iota, _mm, _pixel_coords, _tri_gt, _tri_lt)
from das3r_tpu.ops.splat.settings import RasterSettings

BLOCK = 1024          # entries per grid step
CHUNK = 128           # entries per lane pass (8 chunks per block)

# bf16 storage layout (``RasterSettings.table_bf16``): mean2d needs ~17
# mantissa bits (a plain bf16 ulp at x ~ 512 is 2 PIXELS) so it is stored
# as a bf16 hi + lo pair, exact to ~2^-17 relative (~4e-3 px at x = 512);
# conic/color/opacity are single bf16. 11 rows x 2 B = 22 B/entry vs the
# f32 table's 36. Quantization envelope (documented in docs/PERF.md): the
# image error is DOMINATED by the bf16 color/opacity ulp (2^-9 ~ 2e-3 on
# [0, 1]) — no sub-f32 storage of color can meet a 2e-4 image bar, which
# would need >= 12 mantissa bits. Accumulation stays fp32 in VMEM.
N_ATTR_BF16 = 11
#   0 mean_x_hi  1 mean_x_lo  2 mean_y_hi  3 mean_y_lo
#   4 conic_xx   5 conic_xy   6 conic_yy
#   7 color_r    8 color_g    9 color_b   10 opacity


def encode_bf16_table(table: jax.Array) -> jax.Array:
    """[M, 9] f32 attribute table -> [M, 11] bf16 (layout above)."""
    mean = table[:, :2]
    hi = mean.astype(jnp.bfloat16)
    lo = (mean - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    rest = table[:, 2:].astype(jnp.bfloat16)
    return jnp.concatenate(
        [hi[:, 0:1], lo[:, 0:1], hi[:, 1:2], lo[:, 1:2], rest], axis=1)


def _load_attrs(attrs_ref, settings: RasterSettings):
    """One whole-block load of the [R, BLOCK] attribute slab, decoded to
    the canonical 9-row f32 layout (module docstring). The bf16 table
    reconstructs mean2d from its hi + lo pair; accumulation and all math
    stay fp32."""
    if not settings.table_bf16:
        return attrs_ref[...]
    raw = attrs_ref[...].astype(jnp.float32)        # [11, BLOCK]
    mx = raw[0:1, :] + raw[1:2, :]
    my = raw[2:3, :] + raw[3:4, :]
    return jnp.concatenate([mx, my, raw[4:11, :]], axis=0)


def _chunk_math(ab, px, py, i, T_in, settings: RasterSettings):
    """Shared fwd/bwd quantities for chunk ``i`` of the current block.
    ``ab`` is the decoded [9, BLOCK] f32 slab from ``_load_attrs``.

    Pad slots carry the zero sentinel attribute row (opacity 0 ->
    alpha 0 < alpha_floor), so no explicit slot mask is needed."""
    s = settings
    sl = slice(i * CHUNK, (i + 1) * CHUNK)
    a_mx = ab[0, sl].reshape(1, CHUNK)
    a_my = ab[1, sl].reshape(1, CHUNK)
    a_cxx = ab[2, sl].reshape(1, CHUNK)
    a_cxy = ab[3, sl].reshape(1, CHUNK)
    a_cyy = ab[4, sl].reshape(1, CHUNK)
    a_op = ab[8, sl].reshape(1, CHUNK)

    dx = a_mx - px
    dy = a_my - py
    power = (-0.5 * (a_cxx * dx * dx + a_cyy * dy * dy) - a_cxy * dx * dy)
    alpha_raw = a_op * jnp.exp(power)
    alpha = jnp.minimum(s.alpha_clip, alpha_raw)
    valid = (power <= 0.0) & (alpha >= s.alpha_floor)
    a = jnp.where(valid, alpha, 0.0)
    one_m = 1.0 - a
    cum_before = T_in * jnp.exp(_mm(jnp.log1p(-a), _tri_lt(CHUNK)))
    t_after = cum_before * one_m
    contribute = valid & (t_after >= s.transmittance_eps)
    w = jnp.where(contribute, a * cum_before, 0.0)
    return dx, dy, alpha_raw, a, one_m, cum_before, t_after, contribute, w


def _eye(P: int):
    r = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
    return (r == c).astype(jnp.float32)


def _t_cols(x):
    """[P, C] -> [C, P] via an MXU contraction with the identity (Mosaic
    has no general VPU transpose for narrow minor dims; a P x P identity
    matmul is ~P^2 MACs — noise on the MXU, used once per tile flush)."""
    P = x.shape[0]
    return jax.lax.dot_general(
        x, _eye(P), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _t_rows(x):
    """[C, P] -> [P, C] (same identity-contraction trick)."""
    P = x.shape[1]
    return jax.lax.dot_general(
        _eye(P), x, dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


PACK = 8   # tile-row packing: rows 0-2 = premultiplied color, row 3 =
           # final transmittance, rows 4-7 = sublane-tiling pad (f32 HBM
           # slices must be whole multiples of the (8, 128) tile)


def _forward_kernel(chunk_tile_ref, tile0_ref, attrs_ref, out_ref, tin_ref,
                    cacc, tacc, trun, stage, cur, sems,
                    *, settings: RasterSettings, n_blocks: int,
                    n_tiles_out: int):
    """``chunk_tile`` carries tile indices LOCAL to this kernel's output
    (``n_tiles_out`` rows; void chunks = ``n_tiles_out``); ``tile0`` is the
    global index of local tile 0 — pixel coordinates come from the global
    tile grid, so a tile-sharded caller passes its shard's range start.
    The unsharded path uses tile0 = 0, n_tiles_out = settings.n_tiles.

    Two transmittance accumulators per pixel (CUDA forward semantics,
    forward.cu renderCUDA: ``if (test_T < eps) { done = true; continue; }``):

      * ``trun`` — the RUNNING product over every alpha-tested entry,
        committed even past the eps floor. This is the sticky ``done``
        bit in product form: once a pixel crosses eps it stays below
        forever, so the whole-chunk skip gate ``max(trun) >= eps`` is
        exact AND reachable (the r4 advisor proved the old single-
        accumulator gate unsatisfiable — T was only committed when it
        stayed >= eps, so no saved value could ever sit below the floor).
      * ``tacc`` — the CUDA-visible T: last value that passed the eps
        test (what the crossing entry must NOT commit); flushed as the
        tile's ``tfinal`` output row.

    Pre-crossing the two are equal (every tested entry commits), so
    weights computed from ``trun`` match CUDA exactly; post-crossing no
    entry contributes and only ``tacc`` is observable."""
    s = settings
    P = s.tile * s.tile
    g = pl.program_id(0)
    ab = _load_attrs(attrs_ref, s)

    @pl.when(g == 0)
    def _():
        cur[0] = n_tiles_out      # sentinel: nothing to flush yet
        stage[4:PACK, :] = jnp.zeros((PACK - 4, P), jnp.float32)

    def flush(tile):
        # One [PACK, P] DMA per finished tile (P-minor keeps the slice
        # 128-lane aligned; [P, 3] rows are not DMA-able on Mosaic).
        stage[0:3, :] = _t_cols(cacc[...])
        stage[3:4, :] = _t_cols(tacc[...])
        cp = pltpu.make_async_copy(stage, out_ref.at[tile], sems.at[0])
        cp.start()
        cp.wait()

    for i in range(BLOCK // CHUNK):
        cidx = g * (BLOCK // CHUNK) + i
        tid = chunk_tile_ref[cidx]
        prev = cur[0]
        change = tid != prev

        @pl.when(change & (prev < n_tiles_out))
        def _(prev=prev):
            flush(prev)

        @pl.when(change)
        def _(tid=tid):
            cur[0] = tid
            cacc[...] = jnp.zeros((P, 3), jnp.float32)
            tacc[...] = jnp.ones((P, 1), jnp.float32)
            trun[...] = jnp.ones((P, 1), jnp.float32)

        tin_ref[i] = trun[...]
        T_in = trun[...]

        # Saturation skip: every pixel's running product sits below the
        # transmittance floor -> no entry of this chunk can contribute
        # (cum_before <= T_in < eps for all of them) and the running
        # product can only shrink further, so skipping is exact.
        @pl.when((tid < n_tiles_out)
                 & (jnp.max(T_in) >= s.transmittance_eps))
        def _(tid=tid, i=i, T_in=T_in):
            px, py = _pixel_coords(s, tile0_ref[0] + tid)
            (_, _, _, _, _, cum_before, t_after, contribute,
             w) = _chunk_math(ab, px, py, i, T_in, s)
            sl = slice(i * CHUNK, (i + 1) * CHUNK)
            adds = [
                jnp.sum(w * ab[5 + ch, sl].reshape(1, CHUNK),
                        axis=1, keepdims=True)
                for ch in range(3)
            ]
            cacc[...] += jnp.concatenate(adds, axis=1)
            t_cand = jnp.where(contribute, t_after, tacc[...])
            tacc[...] = jnp.min(t_cand, axis=1, keepdims=True)
            trun[...] = t_after[:, CHUNK - 1:CHUNK]

    @pl.when((g == n_blocks - 1) & (cur[0] < n_tiles_out))
    def _():
        flush(cur[0])


def _backward_kernel(chunk_tile_ref, tile0_ref, attrs_ref, tin_ref, cot_ref,
                     saved_ref, gattrs_ref, svec, gvec, cstage, ostage, cur,
                     sems, *, settings: RasterSettings, n_blocks: int,
                     n_tiles_out: int):
    """Reverse sweep. Blocks arrive in reverse stream order (index_map),
    chunks are processed 7..0 within each block; ``svec`` carries the
    suffix accumulator of the current tile across chunk/block boundaries.
    Tile indexing is local (see ``_forward_kernel``)."""
    s = settings
    P = s.tile * s.tile
    g = pl.program_id(0)
    ab = _load_attrs(attrs_ref, s)
    gattrs_ref[...] = jnp.zeros((N_ATTR, BLOCK), jnp.float32)

    @pl.when(g == 0)
    def _():
        cur[0] = n_tiles_out

    for i in reversed(range(BLOCK // CHUNK)):
        cidx = (n_blocks - 1 - g) * (BLOCK // CHUNK) + i
        tid = chunk_tile_ref[cidx]

        # Entering a tile from the back: load the packed cotangent (rows
        # 0-2 = gC, row 3 = gT) and the saved packed forward output (row 3
        # = T_final); seed the suffix S = gT * T_final (the bg term rides
        # the external composition).
        @pl.when((tid != cur[0]) & (tid < n_tiles_out))
        def _(tid=tid):
            c1 = pltpu.make_async_copy(cot_ref.at[tid], cstage, sems.at[0])
            c2 = pltpu.make_async_copy(saved_ref.at[tid], ostage, sems.at[1])
            c1.start()
            c2.start()
            c1.wait()
            c2.wait()
            gvec[...] = _t_rows(cstage[0:3, :])         # [P, 3]
            svec[...] = _t_rows(cstage[3:4, :] * ostage[3:4, :])

        @pl.when(tid != cur[0])
        def _(tid=tid):
            cur[0] = tid

        # Saturation gate (mirrors the forward kernel): ``tin`` carries
        # the STICKY running transmittance (committed past the eps floor
        # — see the forward docstring), so once every pixel of the tile
        # has crossed, max(T_in) < eps holds for all remaining chunks.
        # In that state ``contribute`` is false everywhere -> w = e =
        # d_alpha = 0, every gradient row is zero (the block output is
        # pre-zeroed) and the suffix accumulator is unchanged — skipping
        # the chunk is EXACT. Dense scenes saturate most of their stream,
        # making this E-scale vs visible-entry-scale backward compute
        # (tests/test_entry_stream.py asserts the skip state actually
        # occurs and that gradients survive it).
        T_in = tin_ref[i]

        @pl.when((tid < n_tiles_out)
                 & (jnp.max(T_in) >= s.transmittance_eps))
        def _(tid=tid, i=i, T_in=T_in):
            px, py = _pixel_coords(s, tile0_ref[0] + tid)
            (dx, dy, alpha_raw, a, one_m, cum_before, _, contribute,
             w) = _chunk_math(ab, px, py, i, T_in, s)
            gcv = gvec[...]                              # [P, 3]
            sl = pl.ds(i * CHUNK, CHUNK)
            slp = slice(i * CHUNK, (i + 1) * CHUNK)

            gc_dot = jnp.zeros((P, CHUNK), jnp.float32)
            for ch in range(3):
                col = ab[5 + ch, slp].reshape(1, CHUNK)
                gch = gcv[:, ch:ch + 1]
                gattrs_ref[5 + ch, sl] = jnp.sum(w * gch, axis=0)
                gc_dot = gc_dot + gch * col

            e = gc_dot * w
            S_i = _mm(e, _tri_gt(CHUNK)) + svec[...]     # [P, CHUNK]

            d_alpha = jnp.where(
                contribute,
                gc_dot * cum_before - S_i / jnp.maximum(one_m, 1e-12), 0.0)
            d_alpha_raw = jnp.where(alpha_raw > s.alpha_clip, 0.0, d_alpha)
            d_power = alpha_raw * d_alpha_raw
            a_op = ab[8, slp].reshape(1, CHUNK)
            gattrs_ref[8, sl] = jnp.sum(
                (alpha_raw / jnp.maximum(a_op, 1e-30)) * d_alpha_raw, axis=0)
            a_cxx = ab[2, slp].reshape(1, CHUNK)
            a_cxy = ab[3, slp].reshape(1, CHUNK)
            a_cyy = ab[4, slp].reshape(1, CHUNK)
            gattrs_ref[2, sl] = jnp.sum(-0.5 * dx * dx * d_power, axis=0)
            gattrs_ref[3, sl] = jnp.sum(-dx * dy * d_power, axis=0)
            gattrs_ref[4, sl] = jnp.sum(-0.5 * dy * dy * d_power, axis=0)
            ddx = (-(a_cxx * dx + a_cxy * dy)) * d_power
            ddy = (-(a_cyy * dy + a_cxy * dx)) * d_power
            gattrs_ref[0, sl] = jnp.sum(ddx, axis=0)
            gattrs_ref[1, sl] = jnp.sum(ddy, axis=0)

            svec[...] = jnp.sum(e, axis=1, keepdims=True) + svec[...]


def _forward_impl(attrs, chunk_tile, tile0, settings: RasterSettings,
                  n_tiles_out: int):
    s = settings
    P = s.tile * s.tile
    n_blocks, n_rows = attrs.shape[0], attrs.shape[1]
    e_al = n_blocks * BLOCK
    kernel = functools.partial(_forward_kernel, settings=s,
                               n_blocks=n_blocks, n_tiles_out=n_tiles_out)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((None, n_rows, BLOCK), lambda g, c, t0: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((BLOCK // CHUNK, P, 1), lambda g, c, t0: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((P, 3), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),     # tacc (CUDA-visible T)
            pltpu.VMEM((P, 1), jnp.float32),     # trun (sticky running T)
            pltpu.VMEM((PACK, P), jnp.float32),  # flush staging (P-minor)
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    packed, tin = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles_out, PACK, P), jnp.float32),
            jax.ShapeDtypeStruct((e_al // CHUNK, P, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(chunk_tile, tile0, attrs)
    return packed, tin


def _backward_impl(attrs, chunk_tile, tile0, tin, cot, saved,
                   settings: RasterSettings, n_tiles_out: int):
    s = settings
    P = s.tile * s.tile
    n_blocks, n_rows = attrs.shape[0], attrs.shape[1]
    e_al = n_blocks * BLOCK
    kernel = functools.partial(_backward_kernel, settings=s,
                               n_blocks=n_blocks, n_tiles_out=n_tiles_out)
    rev = lambda g, c, t0: (n_blocks - 1 - g, 0, 0)      # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((None, n_rows, BLOCK), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK // CHUNK, P, 1), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((None, N_ATTR, BLOCK), rev,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((P, 1), jnp.float32),     # suffix S
            pltpu.VMEM((P, 3), jnp.float32),     # gC of current tile
            pltpu.VMEM((PACK, P), jnp.float32),  # DMA staging: cotangent
            pltpu.VMEM((PACK, P), jnp.float32),  # DMA staging: saved fwd
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, N_ATTR, BLOCK),
                                       jnp.float32),
        interpret=_interpret(),
    )(chunk_tile, tile0, attrs, tin, cot, saved)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def blend_entry_stream(table, rank, chunk_tile, tile0,
                       settings: RasterSettings, n_tiles_out: int):
    """table [N+1, 9] (row N = zero sentinel for pad slots), rank [E_al]
    int32, chunk_tile [E_al/128] int32 (tile ids LOCAL to this call's
    output; void = n_tiles_out), tile0 [1] int32 (global index of local
    tile 0 — pixel coords come from the global grid) -> packed
    [n_tiles_out, PACK, P] tile rows (rows 0-2 = premultiplied color,
    row 3 = final transmittance, rows 4-7 pad), UNDEFINED for empty tiles
    (count == 0) — callers mask with the per-tile count and compose
    ``cpre + tfinal * bg`` externally. Gradients flow to ``table``."""
    packed, _, _ = _fwd_impl_full(table, rank, chunk_tile, tile0, settings,
                                  n_tiles_out)
    return packed


def _fwd_impl_full(table, rank, chunk_tile, tile0, settings, n_tiles_out):
    if settings.table_bf16:
        # Quantize ONCE at N-scale; the E-scale gather and the kernels'
        # VMEM blocks then move 22 B/entry instead of 36. The barrier
        # keeps the encoded table contiguous (same rationale as the f32
        # table barrier in rasterize.py).
        table = jax.lax.optimization_barrier(encode_bf16_table(table))
    n_rows = table.shape[1]
    # [E_al/B, R, B]: batched per-block transposes (a single global
    # [E, R] -> [R, E] transpose measured ~10 ms on TPU; batched is ~free)
    attrs = jnp.swapaxes(
        table[rank].reshape(-1, BLOCK, n_rows), 1, 2)
    packed, tin = _forward_impl(attrs, chunk_tile, tile0, settings,
                                n_tiles_out)
    return packed, attrs, tin


def _fwd(table, rank, chunk_tile, tile0, settings, n_tiles_out):
    packed, attrs, tin = _fwd_impl_full(table, rank, chunk_tile, tile0,
                                        settings, n_tiles_out)
    return packed, (attrs, tin, packed, rank, chunk_tile, tile0,
                    table.shape[0])


_SEG_BLOCK = 1024


def _segment_sum_by_rank(g_rows, rank, n_rows: int) -> jax.Array:
    """Per-table-row sum of entry gradient rows WITHOUT a large-target
    scatter-add.

    XLA's scatter-add processes indices serially at ~18 ns/row into small
    targets and degrades to ~70 ns/row into a 54 MB [1.5M, 9] table —
    478 ms/step at production scale, by far the largest line item of the
    train step; sorted indices and index locality measurably do NOT help
    (docs/PERF.md round-3 cost model). This replacement uses only
    near-bandwidth primitives: sort the (rank, position) pairs (~20 ms at
    6.8M), permute the gradient rows by one row gather (~47 ms), take
    BLOCK-LOCAL prefix sums, and reconstruct each rank's contiguous
    segment from three row gathers at boundary positions (scatter-min of
    first-occurrence positions into the SMALL [n_rows+1] int table + a
    reverse min-scan yields the boundaries).

    Numerics: a GLOBAL prefix sum would lose ~eps * sqrt(E)/seg_len
    relative accuracy to cancellation (measured 2e-1 worst-case rel err at
    6.8M); block-local prefixes bound the cancellation scale to
    sqrt(BLOCK) (~1e-6 rel). A rank has at most ``max_tiles_per_gaussian``
    entries, so its sorted run spans at most TWO blocks whenever
    d_cap <= BLOCK (callers guard); the two-block case composes the first
    block's suffix with the second's prefix. The pad sentinel row
    (rank == n_rows - 1) can span many blocks and gets a garbage-but-
    finite value — its gradient flows into the constant zero sentinel
    table row and is discarded.
    """
    e = rank.shape[0]
    B = _SEG_BLOCK
    assert e % B == 0, e
    rs, perm = jax.lax.sort(
        (rank.astype(jnp.uint32), jax.lax.iota(jnp.uint32, e)),
        dimension=0, num_keys=1)
    gs = g_rows[perm.astype(jnp.int32)]                    # [E, 9] sorted
    L = jnp.cumsum(gs.reshape(-1, B, N_ATTR), axis=1).reshape(e, N_ATTR)
    blk_total = L[B - 1::B]                                # [E/B, 9]
    iota = jax.lax.iota(jnp.int32, e)
    first = jnp.full((n_rows + 1,), e, jnp.int32).at[
        rs.astype(jnp.int32)].min(iota)
    bound = jax.lax.associative_scan(jnp.minimum, first, reverse=True)
    b0, b1 = bound[:-1], bound[1:]                         # [n_rows]
    empty = (b1 == b0)[:, None]
    last = jnp.clip(b1 - 1, 0, e - 1)
    blk_a = b0 // B
    pre = jnp.where(((b0 % B) > 0)[:, None],
                    L[jnp.clip(b0 - 1, 0, e - 1)], 0.0)   # prefix before b0
    l_end = L[last]                                        # local incl. prefix
    same = (blk_a == last // B)[:, None]
    one_block = l_end - pre
    two_block = (blk_total[jnp.clip(blk_a, 0, e // B - 1)] - pre) + l_end
    return jnp.where(empty, 0.0, jnp.where(same, one_block, two_block))


def _bwd(settings, n_tiles_out, res, cot):
    attrs, tin, packed, rank, chunk_tile, tile0, n_rows = res
    gattrs = _backward_impl(attrs, chunk_tile, tile0, tin, cot, packed,
                            settings, n_tiles_out)
    g_rows = jnp.swapaxes(gattrs, 1, 2).reshape(-1, N_ATTR)   # [E_al, 9]
    if (settings.segsum_grad_reduce
            and n_rows >= settings.segsum_min_rows
            and settings.max_tiles_per_gaussian <= _SEG_BLOCK
            and g_rows.shape[0] % _SEG_BLOCK == 0):
        g_table = _segment_sum_by_rank(g_rows, rank, n_rows)
    else:
        g_table = jnp.zeros((n_rows, N_ATTR),
                            jnp.float32).at[rank].add(g_rows)
    return g_table, None, None, None


blend_entry_stream.defvjp(_fwd, _bwd)


def render_tiles(table, stream, bg, settings: RasterSettings,
                 tile0=None, n_tiles_out: int | None = None):
    """Empty-tile-safe wrapper around ``blend_entry_stream``: tiles with no
    entries are never flushed by the kernel (their HBM rows are
    uninitialized), so mask them to the (cpre=0, tfinal=1) background case
    before the caller's ``cpre + tfinal * bg`` composition. ``bg`` is
    accepted for signature symmetry but composed by the caller so its
    gradient rides ordinary autodiff.

    ``tile0``/``n_tiles_out``: tile-sharded callers pass their shard's
    global range start and local tile count (stream.chunk_tile must carry
    local ids); default = whole image."""
    del bg
    if n_tiles_out is None:
        n_tiles_out = settings.n_tiles
    if tile0 is None:
        tile0 = jnp.zeros((1,), jnp.int32)
    packed = blend_entry_stream(table, stream.rank, stream.chunk_tile,
                                tile0, settings, n_tiles_out)
    nonempty = (stream.count > 0)[:, None, None]
    cpre = jnp.where(nonempty, packed[:, 0:3, :], 0.0)
    tfinal = jnp.where(nonempty, packed[:, 3:4, :], 1.0)
    return cpre, tfinal
