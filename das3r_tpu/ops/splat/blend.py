"""Per-tile front-to-back alpha blending, vectorized for the TPU VPU.

Reproduces the CUDA ``renderCUDA`` loop semantics *exactly* (so that images
and gradients match the reference rasterizer, BASELINE config[0]):

  * ``power = -0.5 (A dx^2 + C dy^2) - B dx dy``; skip if power > 0
  * ``alpha = min(0.99, opacity * exp(power))``; skip if alpha < 1/255
  * ``test_T = T (1 - alpha)``; if test_T < 1e-4 the pixel is DONE — the
    triggering Gaussian itself does not contribute
  * final color = accumulated + T_final * bg

Instead of a sequential per-pixel loop, each tile processes its depth-sorted
Gaussian list in chunks: within a chunk the running transmittance is a
(shifted) cumulative product and the early-termination flag a cumulative OR —
both data-parallel along the chunk axis, vectorized over the tile's pixels in
the lane dimension. The chunk body is ``jax.checkpoint``-ed so the backward
pass recomputes the [Kc, P] intermediates instead of storing them.

This is the XLA implementation (autodiff backward). A Pallas kernel with the
same contract lives in ``pallas_blend.py`` for the hot path.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from das3r_tpu.ops.splat.binning import TileBins, gids
from das3r_tpu.ops.splat.settings import RasterSettings


class BlendInputs(NamedTuple):
    """Per-Gaussian screen-space attributes consumed by blending ([N, ...])."""
    mean2d: jax.Array   # [N, 2]
    conic: jax.Array    # [N, 3]
    color: jax.Array    # [N, 3]
    opacity: jax.Array  # [N]


def _tile_pixel_coords(settings: RasterSettings, dtype) -> jax.Array:
    """[T, P, 2] float pixel coordinates for every tile (P = tile^2).

    CUDA uses ``pixf = (float)pix`` — integer pixel coords, no +0.5.
    """
    s = settings
    t = s.tile
    local = jnp.stack(
        jnp.meshgrid(jnp.arange(t), jnp.arange(t), indexing="xy"), -1
    ).reshape(-1, 2)                                        # [P, 2] (x, y)
    tx = jnp.arange(s.tiles_x)
    ty = jnp.arange(s.tiles_y)
    origin = jnp.stack(jnp.meshgrid(tx, ty, indexing="xy"), -1).reshape(-1, 2)
    return (origin[:, None, :] * t + local[None, :, :]).astype(dtype)


def _blend_chunk(carry, chunk, *, settings: RasterSettings):
    """One chunk of Gaussians for one batch of tiles.

    carry: (C [B, P, 3], T [B, P], done [B, P] bool)
    chunk: (mean2d [B,Kc,2], conic [B,Kc,3], color [B,Kc,3], op [B,Kc],
            live [B,Kc] bool)
    """
    C, T, done = carry
    mean2d, conic, color, op, live, pix = chunk
    s = settings

    d = mean2d[:, :, None, :] - pix[:, None, :, :]          # [B, Kc, P, 2]
    dx, dy = d[..., 0], d[..., 1]
    power = (-0.5 * (conic[:, :, None, 0] * dx * dx
                     + conic[:, :, None, 2] * dy * dy)
             - conic[:, :, None, 1] * dx * dy)              # [B, Kc, P]
    alpha = jnp.minimum(s.alpha_clip, op[:, :, None] * jnp.exp(power))
    valid = (live[:, :, None] & (power <= 0.0)
             & (alpha >= s.alpha_floor))                    # [B, Kc, P]
    a = jnp.where(valid, alpha, 0.0)

    one_m = 1.0 - a
    cum = jnp.cumprod(one_m, axis=1)
    cum_before = T[:, None, :] * jnp.concatenate(
        [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1)   # T before each k
    t_after = cum_before * one_m

    trigger = valid & (t_after < s.transmittance_eps)
    trig_cum = jnp.cumsum(trigger.astype(jnp.int32), axis=1)
    trig_before = (trig_cum - trigger.astype(jnp.int32)) > 0
    contribute = valid & ~done[:, None, :] & ~trig_before & ~trigger

    w = jnp.where(contribute, a * cum_before, 0.0)          # [B, Kc, P]
    C = C + jnp.einsum("bkp,bkc->bpc", w, color, precision="highest")

    any_trig = trigger.any(axis=1)                          # [B, P]
    first = jnp.argmax(trigger, axis=1)                     # [B, P]
    T_stop = jnp.take_along_axis(cum_before, first[:, None, :], axis=1)[:, 0, :]
    T_new = jnp.where(done, T,
                      jnp.where(any_trig, T_stop, t_after[:, -1, :]))
    done_new = done | any_trig
    return (C, T_new, done_new), None


def blend_tiles(
    inputs: BlendInputs,
    bins: TileBins,
    settings: RasterSettings,
    bg: jax.Array,
    chunk: int = 32,
    tile_batch: int = 256,
) -> jax.Array:
    """Blend all tiles -> [3, H, W] image composited onto ``bg`` [3]."""
    s = settings
    P = s.tile * s.tile
    K = bins.rank.shape[1]      # max_per_tile, or +128 for aligned windows
    assert K % chunk == 0, "window width must be a multiple of chunk"
    n_chunks = K // chunk
    dtype = inputs.mean2d.dtype
    pix_all = _tile_pixel_coords(s, dtype)                   # [T, P, 2]

    def run_batch(batch):
        gid, count, delta, pix = batch                       # [B,K],[B],[B],[B,P,2]
        B = gid.shape[0]
        slot = jnp.arange(K, dtype=jnp.int32)[None, :]
        live_all = ((slot >= delta[:, None])
                    & (slot < (delta + count)[:, None]))     # [B, K]

        def make_chunk(c):
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, c * chunk, chunk, 1)
            g = sl(gid)                                      # [B, Kc]
            return (inputs.mean2d[g], inputs.conic[g], inputs.color[g],
                    inputs.opacity[g], sl(live_all), pix)

        body = jax.checkpoint(
            functools.partial(_blend_chunk, settings=s))

        def scan_body(carry, c):
            return body(carry, make_chunk(c))

        init = (jnp.zeros((B, P, 3), dtype), jnp.ones((B, P), dtype),
                jnp.zeros((B, P), bool))
        (C, T, _), _ = jax.lax.scan(
            scan_body, init, jnp.arange(n_chunks))
        return C + T[..., None] * bg[None, None, :]          # [B, P, 3]

    n_tiles = s.n_tiles
    n_batches = -(-n_tiles // tile_batch)
    pad = n_batches * tile_batch - n_tiles

    def pad0(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    gid_b = pad0(gids(bins)).reshape(n_batches, tile_batch, K)
    count_b = pad0(bins.count).reshape(n_batches, tile_batch)
    delta_b = pad0(bins.delta).reshape(n_batches, tile_batch)
    pix_b = pad0(pix_all).reshape(n_batches, tile_batch, P, 2)

    out = jax.lax.map(run_batch, (gid_b, count_b, delta_b, pix_b))
    out = out.reshape(n_batches * tile_batch, P, 3)[:n_tiles]
    return assemble_image(out, s)


def blend_tiles_sharded(
    inputs: BlendInputs,
    bins: TileBins,
    settings: RasterSettings,
    bg: jax.Array,
    tile_axis: str | None = None,
    chunk: int = 32,
) -> jax.Array:
    """Tile-parallel blend for multi-chip rendering: every tile is processed
    in one flat batch with the tile dimension annotated for SPMD sharding
    over mesh axis ``tile_axis`` (SURVEY.md §2.8 TPU plan — image tiles
    sharded across chips; per-Gaussian grads come back through an XLA
    all-reduce inserted by the partitioner at the gather's transpose).

    Unlike ``blend_tiles`` (sequential lax.map over tile batches to bound
    single-chip memory) this materializes [T_pad, Kc, P] chunk intermediates,
    which is exactly what you want when T is split n_devices ways.
    """
    from jax.sharding import PartitionSpec as P_

    s = settings
    P = s.tile * s.tile
    K = bins.rank.shape[1]      # max_per_tile, or +128 for aligned windows
    assert K % chunk == 0
    n_chunks = K // chunk
    dtype = inputs.mean2d.dtype
    pix_all = _tile_pixel_coords(s, dtype)                   # [T, P, 2]

    n_tiles = s.n_tiles
    constrain = (
        (lambda x: jax.lax.with_sharding_constraint(
            x, P_(tile_axis, *([None] * (x.ndim - 1)))))
        if tile_axis is not None else (lambda x: x))

    gid = constrain(gids(bins))                              # [T, K]
    count = constrain(bins.count)
    delta = constrain(bins.delta)
    pix = constrain(pix_all)
    slot = jnp.arange(K, dtype=jnp.int32)[None, :]
    live_all = ((slot >= delta[:, None])
                & (slot < (delta + count)[:, None]))

    body = jax.checkpoint(functools.partial(_blend_chunk, settings=s))

    def scan_body(carry, c):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, c * chunk, chunk, 1)
        g = sl(gid)
        chunk_data = (inputs.mean2d[g], inputs.conic[g], inputs.color[g],
                      inputs.opacity[g], sl(live_all), pix)
        return body(carry, chunk_data)

    init = (constrain(jnp.zeros((n_tiles, P, 3), dtype)),
            constrain(jnp.ones((n_tiles, P), dtype)),
            constrain(jnp.zeros((n_tiles, P), bool)))
    (C, T, _), _ = jax.lax.scan(scan_body, init, jnp.arange(n_chunks))
    out = C + T[..., None] * bg[None, None, :]
    return assemble_image(out, s)


def assemble_image(tiles: jax.Array, settings: RasterSettings) -> jax.Array:
    """[T, P, 3] per-tile pixels -> [3, H, W] (tiles x-fastest, pixels
    x-fastest within a tile)."""
    s = settings
    t = s.tile
    img = tiles.reshape(s.tiles_y, s.tiles_x, t, t, 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(
        s.tiles_y * t, s.tiles_x * t, 3)
    img = img[: s.image_height, : s.image_width]
    return img.transpose(2, 0, 1)                            # [3, H, W]
