"""Within-process stage breakdown of the rasterizer at the bench.py config
(100k Gaussians, 384x512).  Every stage is timed as a scan-chained jit
dispatch (the chain defeats relay memoization — see docs/PERF.md), so the
DIFFERENCES between cumulative stages are trustworthy even though absolute
relay numbers drift between sessions.

Usage:  python scripts/bench_raster_stages.py [--iters 30] [--stages a,b,..]
Prints one line per stage: name  ms/iter.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

N_GAUSSIANS = 100_000
HEIGHT, WIDTH = 384, 512


def build():
    from das3r_tpu.data.synthetic import random_gaussian_scene
    from das3r_tpu.models import render as render_mod
    from das3r_tpu.models.gaussians import (activated_opacity,
                                            activated_scaling,
                                            per_gaussian_conf)
    from das3r_tpu.ops.splat import RasterSettings
    from das3r_tpu.ops.splat import binning, blend, preprocess as prep_mod
    from das3r_tpu.ops.splat import pallas_blend
    from das3r_tpu.train import loss as loss_mod
    from das3r_tpu.utils.quat import pose_to_w2c, quat_mul

    settings = RasterSettings(
        image_height=HEIGHT, image_width=WIDTH, sh_degree=3,
        max_per_tile=1024, max_tiles_per_gaussian=32,
        max_total_entries=8 * N_GAUSSIANS)
    params, meta, poses = random_gaussian_scene(
        n=N_GAUSSIANS, n_frames=2, height=HEIGHT, width=WIDTH, seed=0)
    bg = jnp.zeros(3)
    fov = jnp.asarray(1.0, jnp.float32)
    gt = jnp.zeros((3, HEIGHT, WIDTH))
    pose7 = poses.pose(0)
    s = settings

    # ---- raster-input glue (mirrors models/render.py mode='train')
    def raster_inputs(eps):
        safe_rot = jnp.where(meta.alive[:, None], params.rotation,
                             jnp.asarray([1.0, 0, 0, 0], jnp.float32))
        p = params._replace(rotation=safe_rot,
                            xyz=params.xyz + eps)
        w2c = pose_to_w2c(pose7)
        xyz_cam = jnp.matmul(p.xyz, w2c[:3, :3].T,
                             precision="highest") + w2c[:3, 3]
        rot_cam = quat_mul(pose7[:4], p.rotation)
        opacity = (activated_opacity(p)
                   * per_gaussian_conf(p, meta)[:, None]
                   * meta.alive[:, None])
        shs = jnp.concatenate([p.features_dc, p.features_rest], axis=1)
        view, proj, campos, tfx, tfy = render_mod._raster_common(fov, fov)
        return dict(means3d=xyz_cam, opacities=opacity, shs=shs,
                    scales=activated_scaling(p), rotations=rot_cam,
                    viewmatrix=view, projmatrix=proj, campos=campos,
                    tan_fovx=tfx, tan_fovy=tfy)

    def prep(eps):
        ri = raster_inputs(eps)
        return prep_mod.preprocess(
            ri["means3d"], ri["opacities"], s,
            viewmatrix=ri["viewmatrix"], projmatrix=ri["projmatrix"],
            campos=ri["campos"], shs=ri["shs"], scales=ri["scales"],
            rotations=ri["rotations"], tan_fovx=ri["tan_fovx"],
            tan_fovy=ri["tan_fovy"])

    def reduce_prep(p):
        return (jnp.sum(p.mean2d) + jnp.sum(p.conic) + jnp.sum(p.color)
                + jnp.sum(p.depth) + jnp.sum(p.n_tiles_touched)).astype(
                    jnp.float32)

    # ---- cumulative pipelines (all return a scalar that depends on every
    # expensive intermediate, so nothing is DCE'd)
    def f_prep(eps):
        return reduce_prep(prep(eps))

    def f_prep_bin(eps):
        p = prep(eps)
        bins = binning.bin_gaussians(jax.lax.stop_gradient(p), s)
        return reduce_prep(p) + jnp.sum(bins.gid).astype(jnp.float32)

    def f_prep_bin_gather(eps):
        p = prep(eps)
        bins = binning.bin_gaussians(jax.lax.stop_gradient(p), s)
        attr_mat = jnp.concatenate(
            [p.mean2d, p.conic, p.color, p.opacity[:, None]], axis=1)
        gathered = attr_mat[bins.gid]
        return jnp.sum(gathered) * 1e-6

    def f_full_fwd(eps):
        p = prep(eps)
        bins = jax.tree.map(jax.lax.stop_gradient,
                            binning.bin_gaussians(jax.lax.stop_gradient(p), s))
        attr_mat = jnp.concatenate(
            [p.mean2d, p.conic, p.color, p.opacity[:, None]], axis=1)
        gathered = attr_mat[bins.gid]
        tiles = pallas_blend.blend_tiles_pallas(
            jnp.swapaxes(gathered, 1, 2), bins.count, bg, s)
        img = blend.assemble_image(tiles, s)
        return jnp.sum(img) * 1e-6

    def loss_at(eps):
        out = render_mod.render(params._replace(xyz=params.xyz + eps),
                                meta, s, pose7, bg, fov, fov, mode="train")
        return loss_mod.photometric_loss(out.image, gt,
                                         params.conf_static[0]).loss

    def f_full_fwd_bwd(eps):
        g = jax.grad(loss_at)(eps)
        return jnp.sum(g) * 1e-6

    # ---- micro stages (isolated ops on realistic data)
    p0 = jax.jit(prep)(jnp.zeros(3))
    p0 = jax.tree.map(lambda x: jax.device_get(x), p0)
    p0 = jax.tree.map(jnp.asarray, p0)

    def f_argsort(eps):
        d = p0.depth + eps[0]
        order = jnp.argsort(jnp.where(p0.binnable, d, jnp.inf), stable=True)
        return jnp.sum(order).astype(jnp.float32) * 1e-6

    e_cap = s.max_total_entries
    d_cap = s.max_tiles_per_gaussian
    n = N_GAUSSIANS

    def table_and_pos(eps):
        """The dup-table build exactly as bin_gaussians' packable path."""
        d = p0.depth + eps[0]
        order = jnp.argsort(jnp.where(p0.binnable, d, jnp.inf), stable=True)
        rect_min = p0.rect_min[order]
        rect_max = p0.rect_max[order]
        alive_sorted = p0.binnable[order]
        width = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1)
        ntt = jnp.where(alive_sorted,
                        jnp.minimum(p0.n_tiles_touched[order], d_cap), 0)
        d_idx = jnp.arange(d_cap, dtype=jnp.int32)[None, :]
        row = ((d_idx.astype(jnp.float32) + 0.5)
               / width[:, None].astype(jnp.float32)).astype(jnp.int32)
        col = d_idx - row * width[:, None]
        ty = rect_min[:, 1:2] + row
        tx = rect_min[:, 0:1] + col
        tile = ty * s.tiles_x + tx
        dup_valid = alive_sorted[:, None] & (d_idx < ntt[:, None])
        tile = jnp.where(dup_valid, tile, s.n_tiles).astype(jnp.int32)
        nbits = max(int(n - 1).bit_length(), 1)
        rank = jax.lax.broadcasted_iota(jnp.uint32, (n, d_cap), 0)
        packed = (tile.astype(jnp.uint32) << nbits) | rank
        sentinel = jnp.uint32(((s.n_tiles + 1) << nbits) - 1)
        base = jnp.cumsum(ntt) - ntt
        pos = base[:, None] + d_idx
        in_buf = dup_valid & (pos < e_cap)
        pos = jnp.where(in_buf, pos, e_cap).reshape(-1)
        return packed, pos, in_buf, sentinel, order, nbits

    def f_table(eps):
        packed, pos, in_buf, sentinel, order, nbits = table_and_pos(eps)
        return (jnp.sum(packed.astype(jnp.float32)) * 1e-12
                + jnp.sum(pos).astype(jnp.float32) * 1e-12)

    def f_table_scatter(eps):
        packed, pos, in_buf, sentinel, order, nbits = table_and_pos(eps)
        buf_key = jnp.full((e_cap + 1,), sentinel).at[pos].set(
            jnp.where(in_buf, packed, sentinel).reshape(-1),
            unique_indices=True)[:-1]
        return jnp.sum(buf_key.astype(jnp.float32)) * 1e-12

    def f_table_scatter_sort(eps):
        packed, pos, in_buf, sentinel, order, nbits = table_and_pos(eps)
        buf_key = jnp.full((e_cap + 1,), sentinel).at[pos].set(
            jnp.where(in_buf, packed, sentinel).reshape(-1),
            unique_indices=True)[:-1]
        sorted_packed = jax.lax.sort(buf_key, dimension=0)
        return jnp.sum(sorted_packed.astype(jnp.float32)) * 1e-12

    def f_table_fullsort(eps):
        """No-compaction variant: sort the whole N*D table."""
        packed, pos, in_buf, sentinel, order, nbits = table_and_pos(eps)
        keys = jnp.where(in_buf, packed, sentinel).reshape(-1)
        sorted_packed = jax.lax.sort(keys, dimension=0)
        return jnp.sum(sorted_packed.astype(jnp.float32)) * 1e-12

    bins0 = jax.jit(lambda: binning.bin_gaussians(p0, s))()
    gid0 = jax.device_get(bins0.gid)
    gid0 = jnp.asarray(gid0)
    gtile = jax.random.normal(jax.random.PRNGKey(0),
                              (s.n_tiles, 9, s.max_per_tile))

    def f_scatter_add(eps):
        # same shape contract as the pallas-backend VJP: per-slot grads
        # [T, 9, K] accumulated per Gaussian
        g = gtile + eps[0]
        acc = jnp.zeros((n, 9)).at[gid0.reshape(-1)].add(
            jnp.swapaxes(g, 1, 2).reshape(-1, 9))
        return jnp.sum(acc) * 1e-9

    stages = {
        "prep": f_prep,
        "prep_bin": f_prep_bin,
        "prep_bin_gather": f_prep_bin_gather,
        "full_fwd": f_full_fwd,
        "full_fwd_bwd": f_full_fwd_bwd,
        "argsort100k": f_argsort,
        "table": f_table,
        "table_scatter": f_table_scatter,
        "table_scatter_sort": f_table_scatter_sort,
        "table_fullsort": f_table_fullsort,
        "scatter_add_TK9": f_scatter_add,
    }
    return stages


def time_stage(fn, iters):
    @jax.jit
    def chain(c):
        def step(c, _):
            out = fn(jnp.full((3,), c * 1e-30))
            return c + out * 1e-30, ()
        c, _ = jax.lax.scan(step, c, None, length=iters)
        return c

    c = jnp.asarray(1.0)
    jax.block_until_ready(chain(c))          # compile+warm
    t0 = time.perf_counter()
    out = chain(c + 1e-6)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return dt / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--stages", type=str, default="")
    args = ap.parse_args()
    stages = build()
    wanted = (args.stages.split(",") if args.stages
              else list(stages.keys()))
    for name in wanted:
        ms = time_stage(stages[name], args.iters)
        print(f"{name:24s} {ms:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
