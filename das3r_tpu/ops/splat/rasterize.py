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


class RasterAux(NamedTuple):
    n_contrib_tiles: jax.Array   # [T] live Gaussians per tile (pre-truncation)
    tile_overflow: jax.Array     # [] tiles whose list was truncated to K
    dup_overflow: jax.Array      # [] gaussians whose rect was cut by D
    entry_overflow: jax.Array    # [] entries dropped by max_total_entries


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
    backend: str = "auto",   # auto | xla | pallas
):
    """Render N Gaussians -> ([3, H, W] image, [N] int32 radii, RasterAux).

    ``gauss_axis``: mesh axis the primitive (N) axis of the inputs is
    sharded over. Preprocessing then runs shard-local and the small
    per-Gaussian screen-space outputs are all-gathered here (binning's sort
    is global); the transpose reduce-scatters per-Gaussian gradients back
    to the shards where the params/Adam state live (SURVEY.md §2.8).
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
        backend = "pallas" if (tile_axis is None
                               and jax.default_backend() == "tpu") else "xla"

    if (backend == "pallas" and settings.entry_stream
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
            [attr_mat[es.order], jnp.zeros((1, attr_mat.shape[1]),
                                           attr_mat.dtype)]))
        cpre, tfinal = entry_blend.render_tiles(table, es, bg, settings)
        tiles = cpre + tfinal * bg.reshape(1, 3, 1)     # [T, 3, P]
        img = blend.assemble_image(jnp.swapaxes(tiles, 1, 2), settings)
        aux = RasterAux(
            n_contrib_tiles=es.count,
            tile_overflow=jnp.zeros((), jnp.int32),  # no capacity: exact
            dup_overflow=es.dup_overflow,
            entry_overflow=es.entry_overflow,
        )
        return img, p.radius, aux

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
        attr_rank = attr_mat[bins.order]                    # [N, 9]
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

    aux = RasterAux(
        n_contrib_tiles=bins.full_count,
        tile_overflow=jnp.sum(
            (bins.full_count > settings.max_per_tile).astype(jnp.int32)),
        dup_overflow=bins.dup_overflow,
        entry_overflow=bins.entry_overflow,
    )
    return img, p.radius, aux
