"""Public differentiable rasterization API.

Drop-in functional equivalent of the reference's ``GaussianRasterizer``
(gaussian_renderer/__init__.py:14-17, 131-140):

    image, radii, aux = rasterize(
        means3d, opacities, settings,
        viewmatrix=..., projmatrix=..., campos=..., bg=...,
        tan_fovx=..., tan_fovy=...,
        shs=... | colors_precomp=...,
        scales=... / rotations=... | cov3d_precomp=...,
        mean2d_offset=...)

Differences from CUDA, by design:
  * pure function — no settings object capture, no mutable buffers;
  * ``mean2d_offset`` (zeros [N,2]) replaces the ``screenspace_points``
    grad-capture tensor: take ``jax.grad`` w.r.t. it to get the per-Gaussian
    screen-space gradient used for densification stats
    (scene/gaussian_model.py:568-570);
  * binning indices are ``stop_gradient``-ed; gradients flow through gathered
    values exactly as the CUDA backward replays the blend.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from das3r_tpu.ops.splat import binning, blend, preprocess as prep_mod
from das3r_tpu.ops.splat.settings import RasterSettings


# Candidate light widths for the split dup table; ``RasterAux.dup_hist``
# counts binnable Gaussians whose (d_cap-capped) footprint EXCEEDS each —
# models/autosize.auto_split_table picks the width minimizing the binning
# sort domain from this probe.
DUP_HIST_WIDTHS = (2, 4, 6, 8, 10, 12, 16, 20, 24, 28)


@jax.custom_vjp
def _permute_rows_p(x, order, inv):
    return x[order]


def _permute_rows_fwd(x, order, inv):
    return x[order], inv


def _permute_rows_bwd(inv, g):
    return g[inv], None, None


_permute_rows_p.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def permute_rows(x: jax.Array, order: jax.Array) -> jax.Array:
    """``x[order]`` for a PERMUTATION ``order``, with a permutation-aware
    vjp: the transpose of a permutation gather is a gather by the inverse
    permutation — XLA cannot prove injectivity and emits a scatter-add
    (~18-70 ns/row into the [N, 9] table at production scale, r3 cost
    model) where a row gather runs at ~8.5 ns/row. The inverse is one
    scatter-SET of int singles (~3.3 ns/row), paid in the forward."""
    order = jax.lax.stop_gradient(order)
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype),
        unique_indices=True)
    return _permute_rows_p(x, order, inv)


class RasterAux(NamedTuple):
    n_contrib_tiles: jax.Array   # [T] live Gaussians per tile (pre-truncation)
    tile_overflow: jax.Array     # [] tiles whose list was truncated to K
    dup_overflow: jax.Array      # [] gaussians whose rect was cut by D
    entry_overflow: jax.Array    # [] entries dropped by max_total_entries
    # [] largest per-Gaussian rect tile count this render (pre-cap) — the
    # value ``max_tiles_per_gaussian`` must cover; feeds the autosize dup
    # probe and the trainer's capacity telemetry
    max_tiles_touched: jax.Array
    # [] entries dropped because more Gaussians outgrew the split dup
    # table's light width than ``heavy_rows_cap`` rows (0 with the split
    # table off); the trainer regrows the cap on this signal
    heavy_overflow: jax.Array
    # [] count of binnable Gaussians touching more than
    # ``light_dup_width`` tiles this render — feeds the autosize
    # heavy-rows probe and regrow sizing
    heavy_rows: jax.Array
    # [len(DUP_HIST_WIDTHS)] footprint histogram (counts > each width)
    dup_hist: jax.Array


def _dup_telemetry(p, settings: RasterSettings):
    """(max_tiles_touched, heavy_rows, dup_hist) from preprocess outputs."""
    ntt = jnp.minimum(p.n_tiles_touched, settings.max_tiles_per_gaussian)
    live = p.binnable
    heavy_rows = jnp.sum(
        ((ntt > settings.light_dup_width) & live).astype(jnp.int32))
    hist = jnp.stack([jnp.sum(((ntt > w) & live).astype(jnp.int32))
                      for w in DUP_HIST_WIDTHS])
    return jnp.max(p.n_tiles_touched), heavy_rows, hist


def rasterize(
    means3d: jax.Array,
    opacities: jax.Array,
    settings: RasterSettings,
    *,
    viewmatrix: jax.Array,
    projmatrix: jax.Array,
    campos: jax.Array,
    bg: jax.Array,
    tan_fovx,
    tan_fovy,
    shs: jax.Array | None = None,
    colors_precomp: jax.Array | None = None,
    scales: jax.Array | None = None,
    rotations: jax.Array | None = None,
    cov3d_precomp: jax.Array | None = None,
    mean2d_offset: jax.Array | None = None,
    chunk: int = 32,
    tile_batch: int = 256,
    tile_axis: str | None = None,
    gauss_axis: str | None = None,
    mesh=None,
    backend: str = "auto",   # auto | xla | pallas
):
    """Render N Gaussians -> ([3, H, W] image, [N] int32 radii, RasterAux).

    ``gauss_axis``: mesh axis the primitive (N) axis of the inputs is
    sharded over. Preprocessing then runs shard-local and the small
    per-Gaussian screen-space outputs are all-gathered here (binning's sort
    is global); the transpose reduce-scatters per-Gaussian gradients back
    to the shards where the params/Adam state live (SURVEY.md §2.8).

    ``tile_axis`` (+ ``mesh``): mesh axis to shard image tiles over. With
    the Pallas backend the entry stream is split at tile-range boundaries
    and each shard walks its contiguous sub-stream under ``shard_map``
    (``mesh`` must be the Mesh owning ``tile_axis``); per-Gaussian
    gradients reduce over the axis at the replicated table's transpose.
    Without a mesh the XLA blend with GSPMD sharding constraints is used.
    """
    p = prep_mod.preprocess(
        means3d, opacities, settings,
        viewmatrix=viewmatrix, projmatrix=projmatrix, campos=campos,
        shs=shs, colors_precomp=colors_precomp,
        scales=scales, rotations=rotations, cov3d_precomp=cov3d_precomp,
        mean2d_offset=mean2d_offset,
        tan_fovx=tan_fovx, tan_fovy=tan_fovy)

    if gauss_axis is not None:
        from jax.sharding import PartitionSpec as P_
        # replicate over the gauss axis (XLA inserts the all-gather; its
        # transpose is the per-Gaussian grad reduce-scatter)
        p = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, P_(*([None] * x.ndim))), p)

    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    if (backend == "pallas" and tile_axis is not None and mesh is not None
            and settings.entry_stream
            and binning.entry_stream_supported(means3d.shape[0], settings)):
        return _entry_stream_sharded(p, settings, bg, mesh, tile_axis)

    if (backend == "pallas" and tile_axis is None
            and settings.entry_stream
            and binning.entry_stream_supported(means3d.shape[0], settings)):
        from das3r_tpu.ops.splat import entry_blend
        es = jax.tree.map(
            jax.lax.stop_gradient,
            binning.bin_entry_stream(jax.lax.stop_gradient(p), settings))
        attr_mat = jnp.concatenate(
            [p.mean2d, p.conic, p.color, p.opacity[:, None]], axis=1)
        # Depth-rank-ordered table + zero sentinel row for stream pad
        # slots. The barrier forces ONE contiguous [N+1, 9] table: without
        # it XLA fuses the rank-permutation and the column concat INTO the
        # [E_al]-scale gather (measured ~6x slower, same pathology as the
        # window path's table barrier).
        table = jax.lax.optimization_barrier(jnp.concatenate(
            [permute_rows(attr_mat, es.order),
             jnp.zeros((1, attr_mat.shape[1]), attr_mat.dtype)]))
        cpre, tfinal = entry_blend.render_tiles(table, es, bg, settings)
        tiles = cpre + tfinal * bg.reshape(1, 3, 1)     # [T, 3, P]
        img = blend.assemble_image(jnp.swapaxes(tiles, 1, 2), settings)
        mtt, hrows, hist = _dup_telemetry(p, settings)
        aux = RasterAux(
            n_contrib_tiles=es.count,
            tile_overflow=jnp.zeros((), jnp.int32),  # no capacity: exact
            dup_overflow=es.dup_overflow,
            entry_overflow=es.entry_overflow,
            max_tiles_touched=mtt,
            heavy_overflow=es.heavy_overflow,
            heavy_rows=hrows, dup_hist=hist,
        )
        return img, p.radius, aux

    if backend == "pallas" and tile_axis is not None:
        # tile-sharded without a mesh (or without entry-stream support):
        # the [T, K] Pallas window kernel has no shard_map wrapper, so the
        # GSPMD-constrained XLA blend is the sharded fallback.
        backend = "xla"

    bins = jax.tree.map(
        jax.lax.stop_gradient,
        binning.bin_gaussians(jax.lax.stop_gradient(p), settings))

    if backend == "pallas":
        from das3r_tpu.ops.splat import pallas_blend
        # Materialize ONE contiguous [N, 9] attribute table (the barrier
        # stops XLA from fusing the concat into the window gather, which
        # would turn it into four skinny strided gathers — measured ~3x
        # slower), permute it into depth-rank order at N-scale, then do the
        # single [T, K]-scale gather by rank. The transpose of these two
        # gathers is the per-Gaussian gradient reduction (rank-space
        # scatter-add + N-scale permutation).
        attr_mat = jax.lax.optimization_barrier(jnp.concatenate(
            [p.mean2d, p.conic, p.color, p.opacity[:, None]], axis=1))
        attr_rank = permute_rows(attr_mat, bins.order)      # [N, 9]
        gathered = attr_rank[bins.rank]                     # [T, K, 9]
        tiles = pallas_blend.blend_tiles_pallas(
            jnp.swapaxes(gathered, 1, 2), bins.count, bins.delta, bg,
            settings)
        img = blend.assemble_image(tiles, settings)
    else:
        binputs = blend.BlendInputs(mean2d=p.mean2d, conic=p.conic,
                                    color=p.color, opacity=p.opacity)
        if tile_axis is not None:
            img = blend.blend_tiles_sharded(binputs, bins, settings, bg,
                                            tile_axis=tile_axis, chunk=chunk)
        else:
            img = blend.blend_tiles(binputs, bins, settings, bg, chunk=chunk,
                                    tile_batch=tile_batch)

    mtt, hrows, hist = _dup_telemetry(p, settings)
    aux = RasterAux(
        n_contrib_tiles=bins.full_count,
        tile_overflow=jnp.sum(
            (bins.full_count > settings.max_per_tile).astype(jnp.int32)),
        dup_overflow=bins.dup_overflow,
        entry_overflow=bins.entry_overflow,
        max_tiles_touched=mtt,
        heavy_overflow=bins.heavy_overflow,
        heavy_rows=hrows, dup_hist=hist,
    )
    return img, p.radius, aux


def _entry_stream_sharded(p, settings: RasterSettings, bg, mesh, tile_axis):
    """Tile-sharded entry-stream render (SURVEY.md §2.8, VERDICT r2 #2).

    The global (tile-major, depth-minor) key sort runs replicated — it is
    cheap relative to the blend and its result is needed by every shard's
    searchsorted — then ``shard_map`` (manual over ``tile_axis`` only)
    gives each device a contiguous range of ceil(T / ndev) tiles: the
    shard lays out its own 128-aligned sub-stream (capacity
    ``settings.entries_per_shard`` or the full global cap), walks it with
    the same Pallas kernels as the unsharded path (local output rows,
    global pixel coordinates via ``tile0``), and emits its tile rows.

    Gradients: the depth-rank attribute table enters the shard_map
    replicated, so its cotangent — each shard's scatter-add of per-entry
    gradients — is automatically psum'd over ``tile_axis``: exactly the
    per-Gaussian gradient reduction SURVEY §2.8 calls for, and XLA
    overlaps it with the blend backward."""
    from das3r_tpu.ops.splat import entry_blend
    from jax.sharding import PartitionSpec as P_

    s = settings
    n = p.depth.shape[0]
    ndev = mesh.shape[tile_axis]
    t_loc = -(-s.n_tiles // ndev)
    e_al_loc = s.entries_per_shard or binning.entry_stream_cap(s, n)
    e_al_loc = -(-e_al_loc // 1024) * 1024

    # p is stop_gradient-ed at the call, so every ks array is grad-free;
    # no tree-wide stop_gradient (it would trace the static nbits int).
    ks = binning._sorted_key_stream(jax.lax.stop_gradient(p), settings)
    if ks is None:
        raise ValueError("entry-stream not packable for this geometry")
    attr_mat = jnp.concatenate(
        [p.mean2d, p.conic, p.color, p.opacity[:, None]], axis=1)
    table = jax.lax.optimization_barrier(jnp.concatenate(
        [permute_rows(attr_mat, ks.order),
         jnp.zeros((1, attr_mat.shape[1]), attr_mat.dtype)]))
    nbits = ks.nbits

    def body(table, keys, bg):
        i = jax.lax.axis_index(tile_axis)
        tile0 = (i * t_loc).astype(jnp.int32)
        ks_loc = binning.SortedKeyStream(
            sorted_packed=keys, order=None, boundaries=None, nbits=nbits,
            sentinel=None, dup_overflow=jnp.zeros((), jnp.int32),
            entry_overflow=jnp.zeros((), jnp.int32),
            heavy_overflow=jnp.zeros((), jnp.int32))
        es = binning.entry_stream_from_keys(
            ks_loc, s, n, e_al_loc, tile0=tile0, t_loc=t_loc)
        cpre, tfinal = entry_blend.render_tiles(
            table, es, bg, s, tile0=tile0.reshape(1), n_tiles_out=t_loc)
        tiles = cpre + tfinal * bg.reshape(1, 3, 1)      # [t_loc, 3, P]
        return tiles, es.count, es.entry_overflow.reshape(1)

    tiles, count, drop = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P_(), P_(), P_()),
        out_specs=(P_(tile_axis), P_(tile_axis), P_(tile_axis)),
        axis_names={tile_axis}, check_vma=False,
    )(table, ks.sorted_packed, bg)

    img = blend.assemble_image(
        jnp.swapaxes(tiles[: s.n_tiles], 1, 2), settings)
    mtt, hrows, hist = _dup_telemetry(p, s)
    aux = RasterAux(
        n_contrib_tiles=count[: s.n_tiles],
        tile_overflow=jnp.zeros((), jnp.int32),   # no per-tile capacity
        dup_overflow=ks.dup_overflow,
        entry_overflow=ks.entry_overflow + jnp.sum(drop),
        max_tiles_touched=mtt,
        heavy_overflow=ks.heavy_overflow,
        heavy_rows=hrows, dup_hist=hist,
    )
    return img, p.radius, aux
