"""Sub-stage breakdown of the entry-stream render BACKWARD at production
scale (default 1.5M Gaussians, 288x512). profile_large_r4 showed the
fwd+bwd window at 773 ms vs 259 ms fwd-only — this script isolates where
the ~514 ms of backward goes:

  gather   table[rank] E-scale gather + batched transpose (fwd table build)
  fwdk     _forward_impl Pallas kernel alone (attrs already built)
  bwdk     _backward_impl Pallas kernel alone (residuals prebuilt)
  segsum   _segment_sum_by_rank on the real rank array
  tabvjp   full vjp of render_tiles w.r.t. the attribute table

Chained-scan protocol with a scalar host fetch per window (the relay's
block_until_ready is unreliable — docs/PERF.md measurement warnings).
Large residual arrays are jit ARGUMENTS, never closed-over literals.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=1_500_000)
    ap.add_argument("--height", type=int, default=288)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--windows", type=int, default=2)
    ap.add_argument("--stages", nargs="*", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from das3r_tpu.data.synthetic import random_gaussian_scene
    from das3r_tpu.models import autosize
    from das3r_tpu.ops.splat import RasterSettings, binning, entry_blend
    from das3r_tpu.ops.splat.preprocess import preprocess as preprocess_fn
    from das3r_tpu.utils import transforms
    from das3r_tpu.utils.quat import pose_to_w2c, quat_mul

    H, W, N = args.height, args.width, args.n
    settings = RasterSettings(image_height=H, image_width=W, sh_degree=3,
                              max_per_tile=1024, max_tiles_per_gaussian=32,
                              max_total_entries=8 * N)
    params, meta, poses = random_gaussian_scene(
        n=N, n_frames=2, height=H, width=W, seed=0)
    fov = jnp.asarray(1.0, jnp.float32)
    stats = autosize.probe_capacities(
        params, meta, settings, poses.all_poses(), fov, fov)
    dup_cap = min(-(-max(int(stats.max_dup * 1.3), 8) // 4) * 4, 32)
    split = autosize.auto_split_table(stats, N, dup_cap)
    settings = dataclasses.replace(
        settings,
        max_total_entries=-(-max(int(stats.max_total * 1.2), 8192)
                            // 1024) * 1024,
        max_tiles_per_gaussian=dup_cap, **split)

    # One preprocess + binning pass -> device-resident residuals
    from das3r_tpu.models.gaussians import (activated_opacity,
                                            activated_scaling)
    p7 = poses.pose(0)
    w2c = pose_to_w2c(p7)
    xyz_cam = jnp.matmul(params.xyz, w2c[:3, :3].T,
                         precision="highest") + w2c[:3, 3]
    rot_cam = quat_mul(p7[:4], params.rotation)
    proj = transforms.projection_matrix_dyn(0.01, 100.0, fov, fov).T
    shs = jnp.concatenate([params.features_dc, params.features_rest], 1)

    @jax.jit
    def build(xyz_cam, opac, shs, scales, rot_cam):
        p = preprocess_fn(
            xyz_cam, opac, settings,
            viewmatrix=jnp.eye(4), projmatrix=proj, campos=jnp.zeros(3),
            shs=shs, colors_precomp=None, scales=scales,
            rotations=rot_cam, cov3d_precomp=None, mean2d_offset=None,
            tan_fovx=jnp.tan(fov / 2), tan_fovy=jnp.tan(fov / 2))
        es = binning.bin_entry_stream(p, settings)
        attr_mat = jnp.concatenate(
            [p.mean2d, p.conic, p.color, p.opacity[:, None]], axis=1)
        table = jnp.concatenate(
            [attr_mat[es.order],
             jnp.zeros((1, attr_mat.shape[1]), attr_mat.dtype)])
        return table, es

    table, es = build(xyz_cam, activated_opacity(params), shs,
                      activated_scaling(params), rot_cam)
    table = jax.block_until_ready(table)
    e_al = es.rank.shape[0]
    n_live = int(jnp.sum(es.count))
    print(f"# n={N} e_al={e_al} live={n_live} "
          f"cap={settings.max_total_entries}", flush=True)

    T = settings.n_tiles
    P = settings.tile * settings.tile
    tile0 = jnp.zeros((1,), jnp.int32)

    # residuals for bwdk
    @jax.jit
    def resid(table, rank, chunk_tile):
        return entry_blend._fwd_impl_full(
            table, rank, chunk_tile, tile0, settings, T)

    packed, attrs, tin = resid(table, es.rank, es.chunk_tile)
    cot = jnp.ones((T, entry_blend.PACK, P), jnp.float32)
    g_rows = jnp.swapaxes(
        jnp.ones((e_al // entry_blend.BLOCK, 9, entry_blend.BLOCK),
                 jnp.float32), 1, 2).reshape(-1, 9)

    ops = {"table": table, "rank": es.rank, "chunk_tile": es.chunk_tile,
           "attrs": attrs, "tin": tin, "packed": packed, "cot": cot,
           "g_rows": g_rows, "count": es.count}

    def mk_gather(o, c):
        at = o["table"] * (1.0 + c)
        a = jnp.swapaxes(
            at[o["rank"]].reshape(-1, entry_blend.BLOCK, 9), 1, 2)
        return jnp.sum(a[:, :, ::128])

    def mk_fwdk(o, c):
        pk, _tn = entry_blend._forward_impl(
            o["attrs"] * (1.0 + c), o["chunk_tile"], tile0, settings, T)
        return jnp.sum(pk[:, 3, ::64])

    def mk_bwdk(o, c):
        g = entry_blend._backward_impl(
            o["attrs"] * (1.0 + c), o["chunk_tile"], tile0, o["tin"],
            o["cot"], o["packed"], settings, T)
        return jnp.sum(g[:, :, ::128])

    def mk_segsum(o, c):
        g = entry_blend._segment_sum_by_rank(
            o["g_rows"] * (1.0 + c), o["rank"], N + 1)
        return jnp.sum(g[::64])

    def mk_tabvjp(o, c):
        st = binning.EntryStream(
            rank=o["rank"], chunk_tile=o["chunk_tile"], order=None,
            count=o["count"], dup_overflow=None, entry_overflow=None,
            heavy_overflow=None)

        def f(tb):
            cpre, tfinal = entry_blend.render_tiles(
                tb, st, jnp.zeros(3), settings)
            return jnp.sum(cpre) + jnp.sum(tfinal)
        val, g = jax.value_and_grad(f)(o["table"] * (1.0 + c))
        return val + jnp.sum(g[::256])

    # --- segsum internals (mirrors _segment_sum_by_rank piecewise) ---
    B = entry_blend._SEG_BLOCK
    e = e_al

    def mk_segsort(o, c):
        rs, perm = jax.lax.sort(
            (o["rank"].astype(jnp.uint32) + c.astype(jnp.uint32),
             jax.lax.iota(jnp.uint32, e)), dimension=0, num_keys=1)
        return (jnp.sum(rs[::1024].astype(jnp.float32))
                + jnp.sum(perm[::1024].astype(jnp.float32)))

    rs0, perm0 = jax.jit(lambda r: jax.lax.sort(
        (r.astype(jnp.uint32), jax.lax.iota(jnp.uint32, e)),
        dimension=0, num_keys=1))(es.rank)
    ops["rs"] = rs0
    ops["perm"] = perm0

    def mk_segperm(o, c):
        gs = (o["g_rows"] * (1.0 + c))[o["perm"].astype(jnp.int32)]
        return jnp.sum(gs[::512])

    def mk_segcum(o, c):
        gs = o["g_rows"] * (1.0 + c)
        L = jnp.cumsum(gs.reshape(-1, B, 9), axis=1).reshape(e, 9)
        return jnp.sum(L[::512])

    def mk_segbnd(o, c):
        iota = jax.lax.iota(jnp.int32, e)
        rs = o["rs"].astype(jnp.int32) + c.astype(jnp.int32)
        first = jnp.full((N + 2,), e, jnp.int32).at[rs].min(iota)
        bound = jax.lax.associative_scan(jnp.minimum, first, reverse=True)
        return jnp.sum(bound[::256].astype(jnp.float32))

    stages = {"gather": mk_gather, "fwdk": mk_fwdk, "bwdk": mk_bwdk,
              "segsum": mk_segsum, "tabvjp": mk_tabvjp,
              "segsort": mk_segsort, "segperm": mk_segperm,
              "segcum": mk_segcum, "segbnd": mk_segbnd}

    wanted = args.stages or list(stages)
    for name in wanted:
        fn = stages[name]

        @jax.jit
        def chain(o, c0, fn=fn):
            def body(c, _):
                v = fn(o, c * 1e-12)
                return c + 1e-13 * v, ()
            c, _ = jax.lax.scan(body, c0, None, length=args.iters)
            return jnp.sum(c)

        t0 = time.time()
        _ = float(chain(ops, jnp.zeros(())))
        print(f"# {name} compile+first {time.time() - t0:.1f} s",
              flush=True)
        dt = float("inf")
        for k in range(args.windows):
            t0 = time.perf_counter()
            _ = float(chain(ops, jnp.full((), 1e-9 * (k + 1))))
            dt = min(dt, time.perf_counter() - t0)
        print(json.dumps({"stage": name,
                          "ms_per_iter": round(dt / args.iters * 1e3, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
