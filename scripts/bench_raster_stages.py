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
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N_GAUSSIANS = 100_000
HEIGHT, WIDTH = 384, 512
PROBE = False


def build():
    from das3r_tpu.data.synthetic import random_gaussian_scene
    from das3r_tpu.models import render as render_mod
    from das3r_tpu.models.gaussians import (activated_opacity,
                                            activated_scaling,
                                            per_gaussian_conf)
    from das3r_tpu.ops.splat import RasterSettings
    from das3r_tpu.ops.splat import binning, blend, pallas_blend
    from das3r_tpu.ops.splat.preprocess import preprocess as preprocess_fn
    from das3r_tpu.train import loss as loss_mod
    from das3r_tpu.utils.quat import pose_to_w2c, quat_mul

    settings = RasterSettings(
        image_height=HEIGHT, image_width=WIDTH, sh_degree=3,
        max_per_tile=1024, max_tiles_per_gaussian=32,
        max_total_entries=8 * N_GAUSSIANS)
    params, meta, poses = random_gaussian_scene(
        n=N_GAUSSIANS, n_frames=2, height=HEIGHT, width=WIDTH, seed=0)
    if PROBE:
        # Same per-scene capacity probe as bench_large_step.py, so the
        # stage breakdown measures the EXACT production config.
        import dataclasses as _dcp
        from das3r_tpu.models import autosize
        mx_total, _, mx_dup, mx_heavy = autosize.probe_entry_stats(
            params, meta, settings, poses.all_poses(),
            jnp.asarray(1.0, jnp.float32), jnp.asarray(1.0, jnp.float32))
        settings = _dcp.replace(
            settings,
            max_total_entries=-(-max(int(mx_total * 1.2), 8192) // 1024)
            * 1024,
            max_tiles_per_gaussian=min(
                -(-max(int(mx_dup * 1.3), 8) // 4) * 4,
                settings.max_tiles_per_gaussian),
            heavy_rows_cap=autosize.auto_heavy_cap(mx_heavy))
        print(f"# probed entries_cap={settings.max_total_entries} "
              f"dup_cap={settings.max_tiles_per_gaussian} "
              f"heavy_cap={settings.heavy_rows_cap}", flush=True)
    bg = jnp.zeros(3)
    fov = jnp.asarray(1.0, jnp.float32)
    gt = jnp.zeros((3, HEIGHT, WIDTH))
    pose7 = poses.pose(0)
    s = settings

    # ---- raster-input glue (mirrors models/render.py mode='train')
    def raster_inputs(eps):
        safe_rot = jnp.where(
            jnp.broadcast_to(meta.alive[:, None], params.rotation.shape),
            params.rotation,
            jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                             params.rotation.shape))
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
        return preprocess_fn(
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
        return reduce_prep(p) + jnp.sum(bins.rank).astype(jnp.float32)

    import dataclasses as _dc
    s_fullsort = _dc.replace(settings, max_total_entries=None)
    s_compact = _dc.replace(settings, full_sort_below=0)

    def f_prep_bin_fullsort(eps):
        p = prep(eps)
        bins = binning.bin_gaussians(jax.lax.stop_gradient(p), s_fullsort)
        return reduce_prep(p) + jnp.sum(bins.rank).astype(jnp.float32)

    def f_prep_bin_compact(eps):
        p = prep(eps)
        bins = binning.bin_gaussians(jax.lax.stop_gradient(p), s_compact)
        return reduce_prep(p) + jnp.sum(bins.rank).astype(jnp.float32)

    def f_prep_bin_gather(eps):
        p = prep(eps)
        bins = binning.bin_gaussians(jax.lax.stop_gradient(p), s)
        attr_mat = jax.lax.optimization_barrier(jnp.concatenate(
            [p.mean2d, p.conic, p.color, p.opacity[:, None]], axis=1))
        gathered = attr_mat[bins.order][bins.rank]
        return jnp.sum(gathered) * 1e-6

    def f_full_fwd(eps):
        p = prep(eps)
        bins = jax.tree.map(jax.lax.stop_gradient,
                            binning.bin_gaussians(jax.lax.stop_gradient(p), s))
        attr_mat = jax.lax.optimization_barrier(jnp.concatenate(
            [p.mean2d, p.conic, p.color, p.opacity[:, None]], axis=1))
        gathered = attr_mat[bins.order][bins.rank]
        tiles = pallas_blend.blend_tiles_pallas(
            jnp.swapaxes(gathered, 1, 2), bins.count, bins.delta, bg, s)
        img = blend.assemble_image(tiles, s)
        return jnp.sum(img) * 1e-6

    # ---- entry-stream pipeline stages (the TPU production path)
    from das3r_tpu.ops.splat import entry_blend

    def es_table(p, es):
        attr_mat = jnp.concatenate(
            [p.mean2d, p.conic, p.color, p.opacity[:, None]], axis=1)
        return jax.lax.optimization_barrier(jnp.concatenate(
            [attr_mat[es.order],
             jnp.zeros((1, attr_mat.shape[1]), attr_mat.dtype)]))

    def f_es_bin(eps):
        p = prep(eps)
        es = binning.bin_entry_stream(jax.lax.stop_gradient(p), s)
        return reduce_prep(p) + jnp.sum(es.rank).astype(jnp.float32)

    def f_es_gather(eps):
        p = prep(eps)
        es = jax.tree.map(
            jax.lax.stop_gradient,
            binning.bin_entry_stream(jax.lax.stop_gradient(p), s))
        table = es_table(p, es)
        attrs = jnp.swapaxes(
            table[es.rank].reshape(-1, entry_blend.BLOCK,
                                   table.shape[1]), 1, 2)
        return jnp.sum(attrs) * 1e-6

    def f_es_fwd(eps):
        p = prep(eps)
        es = jax.tree.map(
            jax.lax.stop_gradient,
            binning.bin_entry_stream(jax.lax.stop_gradient(p), s))
        table = es_table(p, es)
        cpre, tfinal = entry_blend.render_tiles(table, es, bg, s)
        tiles = cpre + tfinal * bg.reshape(1, 3, 1)
        img = blend.assemble_image(jnp.swapaxes(tiles, 1, 2), s)
        return jnp.sum(img) * 1e-6

    def loss_at(eps):
        out = render_mod.render(params._replace(xyz=params.xyz + eps),
                                meta, s, pose7, bg, fov, fov, mode="train")
        return loss_mod.photometric_loss(out.image, gt,
                                         params.conf_static[0]).loss

    def f_full_fwd_bwd(eps):
        g = jax.grad(loss_at)(eps)
        return jnp.sum(g) * 1e-6

    def loss_at_fullsort(eps):
        out = render_mod.render(params._replace(xyz=params.xyz + eps),
                                meta, s_fullsort, pose7, bg, fov, fov,
                                mode="train")
        return loss_mod.photometric_loss(out.image, gt,
                                         params.conf_static[0]).loss

    def f_full_fwd_bwd_fullsort(eps):
        g = jax.grad(loss_at_fullsort)(eps)
        return jnp.sum(g) * 1e-6

    # ---- micro stages (isolated ops on realistic data)
    p0 = jax.jit(prep)(jnp.zeros(3))
    p0 = jax.tree.map(lambda x: jax.device_get(x), p0)
    p0 = jax.tree.map(jnp.asarray, p0)

    def f_argsort(eps):
        d = p0.depth + eps[0]
        order = jnp.argsort(jnp.where(p0.binnable, d, jnp.inf), stable=True)
        return jnp.sum(order).astype(jnp.float32) * 1e-6

    # ---- entry-stream micro stages on realistic binned data
    es0 = None
    if (s.max_total_entries is not None
            and binning.entry_stream_supported(N_GAUSSIANS, s)):
        es0 = jax.jit(lambda: binning.bin_entry_stream(p0, s))()
        es0 = jax.tree.map(lambda x: jnp.asarray(jax.device_get(x)), es0)
        print(f"# entry stream: E_al={es0.rank.shape[0]} "
              f"live={int(jnp.sum(es0.count))}", flush=True)

    def f_sort_E(eps):
        keys = es0.rank.astype(jnp.uint32) + (eps[0] * 1e30).astype(
            jnp.uint32)
        return jnp.sum(
            jax.lax.sort(keys, dimension=0).astype(jnp.float32)) * 1e-6

    table_z = jnp.zeros((N_GAUSSIANS + 1, 9))

    def f_gather_E_rows9(eps):
        t = table_z + eps[0]
        attrs = jnp.swapaxes(
            t[es0.rank].reshape(-1, 1024, 9), 1, 2)
        return jnp.sum(attrs) * 1e-6

    def f_scatterN_from_E(eps):
        g_rows = jnp.full((es0.rank.shape[0], 9), eps[0])
        acc = jnp.zeros((N_GAUSSIANS + 1, 9)).at[es0.rank].add(g_rows)
        return jnp.sum(acc) * 1e-9

    # ---- locality hypothesis: with table rows ordered by SCREEN position
    # (min tile) instead of depth, the stream-order scatter indices cluster
    # within each tile's active set instead of striding the whole 54 MB
    # table — random-DRAM-row cost should collapse toward the small-target
    # 18 ns/row figure.
    if es0 is not None:
        key_sp = (p0.rect_min[:, 1] * s.tiles_x + p0.rect_min[:, 0])
        key_sp = jnp.where(p0.binnable, key_sp, jnp.int32(2**30))
        sp_of_gauss = jnp.argsort(key_sp).astype(jnp.int32)
        inv_sp = jnp.zeros((N_GAUSSIANS,), jnp.int32).at[sp_of_gauss].set(
            jnp.arange(N_GAUSSIANS, dtype=jnp.int32))
        d2s_const = jnp.concatenate(
            [inv_sp[es0.order], jnp.asarray([N_GAUSSIANS], jnp.int32)])
        rank_sp_const = jnp.asarray(jax.device_get(d2s_const[es0.rank]))

    def f_scatter_clustered(eps):
        g = jnp.full((es0.rank.shape[0], 9), eps[0])
        acc = jnp.zeros((N_GAUSSIANS + 1, 9)).at[rank_sp_const].add(g)
        return jnp.sum(acc) * 1e-9

    def f_gather_clustered(eps):
        t = table_z + eps[0]
        attrs = jnp.swapaxes(
            t[rank_sp_const].reshape(-1, 1024, 9), 1, 2)
        return jnp.sum(attrs) * 1e-6

    def f_remap_gather(eps):
        m = d2s_const + (eps[0] * 1e30).astype(jnp.int32)
        return jnp.sum(m[es0.rank].astype(jnp.float32)) * 1e-9

    # ---- backward-reduction candidates: the per-Gaussian grad scatter-add
    # measured ~70 ns/row into a 54 MB target at 1.5M (4x the small-target
    # cost) — these test the rank-sort -> sorted-scatter replacement
    def f_pairsort_E(eps):
        r = es0.rank.astype(jnp.uint32) + (eps[0] * 1e30).astype(jnp.uint32)
        rs, perm = jax.lax.sort(
            (r, jax.lax.iota(jnp.uint32, es0.rank.shape[0])),
            dimension=0, num_keys=1)
        return (jnp.sum(rs.astype(jnp.float32))
                + jnp.sum(perm.astype(jnp.float32))) * 1e-9

    ranks_sorted_const = jnp.sort(es0.rank)

    def f_scatter_sorted_only(eps):
        g = jnp.full((es0.rank.shape[0], 9), eps[0])
        acc = jnp.zeros((N_GAUSSIANS + 1, 9)).at[ranks_sorted_const].add(
            g, indices_are_sorted=True)
        return jnp.sum(acc) * 1e-9

    def f_bwd_reduce_sorted(eps):
        """Full candidate: pair-sort (rank, iota) -> permute grad rows ->
        scatter-add with sorted indices."""
        g_rows = jnp.full((es0.rank.shape[0], 9), eps[0])
        rs, perm = jax.lax.sort(
            (es0.rank.astype(jnp.uint32),
             jax.lax.iota(jnp.uint32, es0.rank.shape[0])),
            dimension=0, num_keys=1)
        gs = g_rows[perm.astype(jnp.int32)]
        acc = jnp.zeros((N_GAUSSIANS + 1, 9)).at[
            rs.astype(jnp.int32)].add(gs, indices_are_sorted=True)
        return jnp.sum(acc) * 1e-9

    def f_scatter_min_small(eps):
        iota = jax.lax.iota(jnp.int32, es0.rank.shape[0])
        shift = (eps[0] * 1e30).astype(jnp.int32)
        first = jnp.full((N_GAUSSIANS + 2,), es0.rank.shape[0],
                         jnp.int32).at[es0.rank + shift].min(iota)
        return jnp.sum(first.astype(jnp.float32)) * 1e-9

    def f_bwd_reduce_cumsum(eps):
        """Candidate: rank-sort -> permute -> prefix sum -> boundary diff.
        All components are near-bandwidth (no large-target scatter)."""
        e_al2 = es0.rank.shape[0]
        g_rows = jnp.full((e_al2, 9), eps[0])
        rs, perm = jax.lax.sort(
            (es0.rank.astype(jnp.uint32), jax.lax.iota(jnp.uint32, e_al2)),
            dimension=0, num_keys=1)
        gs = g_rows[perm.astype(jnp.int32)]
        csum = jnp.concatenate(
            [jnp.zeros((1, 9)), jnp.cumsum(gs, axis=0)])
        iota = jax.lax.iota(jnp.int32, e_al2)
        first = jnp.full((N_GAUSSIANS + 2,), e_al2,
                         jnp.int32).at[rs.astype(jnp.int32)].min(iota)
        bound = jax.lax.associative_scan(jnp.minimum, first, reverse=True)
        seg = csum[bound[1:]] - csum[bound[:-1]]        # [N+1, 9]
        return jnp.sum(seg) * 1e-9

    def f_ks_split(eps):
        """prep + key build + sort only (no stream layout/extraction)."""
        p = prep(eps)
        ks = binning._sorted_key_stream(jax.lax.stop_gradient(p), s)
        return reduce_prep(p) + jnp.sum(
            ks.sorted_packed.astype(jnp.float32)) * 1e-12

    # ---- one full trainer iteration (render + loss + grads + both Adams)
    from das3r_tpu.train import step as step_mod
    from das3r_tpu.train.config import OptimizationConfig
    cfg_tr = OptimizationConfig(iterations=4000)
    state0 = step_mod.init_train_state(params, poses)
    gt2 = jnp.zeros((2, 3, HEIGHT, WIDTH))
    fovs2 = jnp.full((2,), 1.0, jnp.float32)
    uids1 = jnp.zeros((1,), jnp.int32)

    def f_train1(eps):
        _, _, m = step_mod.train_chunk(
            state0, meta, uids1, gt2 + eps[0], fovs2, fovs2, bg, s, cfg_tr)
        return jnp.sum(m.loss)

    # isolated sort of the FULL padded N*D dup table (the es_bin full-sort
    # path's dominant op at production scale)
    def f_sort_ND(eps):
        base = jax.lax.broadcasted_iota(
            jnp.uint32, (N_GAUSSIANS * s.max_tiles_per_gaussian,), 0)
        keys = base * jnp.uint32(2654435761) + (eps[0] * 1e30).astype(
            jnp.uint32)
        return jnp.sum(
            jax.lax.sort(keys, dimension=0).astype(jnp.float32)) * 1e-12

    # gather + fwd kernel + bwd kernel + scatter-add, grads to the table
    # only (no N-scale preprocess/SH backward, no binning in the graph)
    def f_es_blend_bwd(eps):
        def f(t):
            cpre, tfinal = entry_blend.render_tiles(t, es0, bg, s)
            return jnp.sum(cpre) + jnp.sum(tfinal)
        return jnp.sum(jax.grad(f)(table_z + eps[0])) * 1e-6

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
    gid0 = jax.device_get(jax.jit(lambda: binning.gids(bins0))())
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

    # ---- preprocess sub-stages: einsum/AoS vs hand-expanded SoA
    from das3r_tpu.ops.splat.preprocess import build_cov3d
    from das3r_tpu.utils.quat import quat_to_rotmat
    from das3r_tpu.utils import sh as sh_lib
    scal = jnp.exp(params.scaling)
    rots = params.rotation
    xyz = params.xyz
    shs_full = jnp.concatenate([params.features_dc, params.features_rest], 1)
    vm = jnp.eye(4)

    def f_ri(eps):
        ri = raster_inputs(eps)
        return (jnp.sum(ri["means3d"]) + jnp.sum(ri["opacities"])
                + jnp.sum(ri["rotations"]) + jnp.sum(ri["shs"]) * 1e-6)

    def f_cov3d_einsum(eps):
        c = build_cov3d(scal + eps, rots, 1.0)
        return jnp.sum(c) * 1e-6

    def f_cov3d_soa(eps):
        q = rots / jnp.linalg.norm(rots, axis=-1, keepdims=True).clip(1e-12)
        r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        R00 = 1 - 2 * (y * y + z * z)
        R01 = 2 * (x * y - r * z)
        R02 = 2 * (x * z + r * y)
        R10 = 2 * (x * y + r * z)
        R11 = 1 - 2 * (x * x + z * z)
        R12 = 2 * (y * z - r * x)
        R20 = 2 * (x * z - r * y)
        R21 = 2 * (y * z + r * x)
        R22 = 1 - 2 * (x * x + y * y)
        sc = scal + eps
        s0, s1, s2 = sc[:, 0], sc[:, 1], sc[:, 2]
        L00, L01, L02 = R00 * s0, R01 * s1, R02 * s2
        L10, L11, L12 = R10 * s0, R11 * s1, R12 * s2
        L20, L21, L22 = R20 * s0, R21 * s1, R22 * s2
        xx = L00 * L00 + L01 * L01 + L02 * L02
        xy = L00 * L10 + L01 * L11 + L02 * L12
        xz = L00 * L20 + L01 * L21 + L02 * L22
        yy = L10 * L10 + L11 * L11 + L12 * L12
        yz = L10 * L20 + L11 * L21 + L12 * L22
        zz = L20 * L20 + L21 * L21 + L22 * L22
        return (jnp.sum(xx + yy + zz) + jnp.sum(xy + xz + yz)) * 1e-6

    def f_proj_matmul(eps):
        homo = jnp.concatenate([xyz + eps, jnp.ones((n, 1))], -1)
        pv = jnp.matmul(homo, vm, precision="highest")
        return jnp.sum(pv) * 1e-6

    def f_proj_soa(eps):
        x, y, z = (xyz[:, 0] + eps[0], xyz[:, 1] + eps[1],
                   xyz[:, 2] + eps[2])
        outs = [x * vm[0, c] + y * vm[1, c] + z * vm[2, c] + vm[3, c]
                for c in range(4)]
        return sum(jnp.sum(o) for o in outs) * 1e-6

    def f_sh_aos(eps):
        direction = (xyz + eps)
        direction = direction / jnp.linalg.norm(
            direction, axis=-1, keepdims=True).clip(1e-12)
        raw = sh_lib.eval_sh(3, jnp.swapaxes(shs_full, -1, -2), direction)
        return jnp.sum(raw) * 1e-6

    sh_soa = jnp.asarray(
        jnp.swapaxes(shs_full, 0, 2).reshape(3 * 16, -1))   # [48, N] rows

    def f_sh_soa(eps):
        d = xyz + eps
        inv = jax.lax.rsqrt((d * d).sum(-1).clip(1e-24))
        x, y, z = d[:, 0] * inv, d[:, 1] * inv, d[:, 2] * inv
        out = []
        for c in range(3):
            sh = lambda k: sh_soa[c * 16 + k]
            res = 0.28209479177387814 * sh(0)
            res = (res - 0.4886025119029199 * y * sh(1)
                   + 0.4886025119029199 * z * sh(2)
                   - 0.4886025119029199 * x * sh(3))
            xx, yy, zz = x * x, y * y, z * z
            res = (res + 1.0925484305920792 * x * y * sh(4)
                   - 1.0925484305920792 * y * z * sh(5)
                   + 0.31539156525252005 * (2 * zz - xx - yy) * sh(6)
                   - 1.0925484305920792 * x * z * sh(7)
                   + 0.5462742152960396 * (xx - yy) * sh(8))
            res = (res - 0.5900435899266435 * y * (3 * xx - yy) * sh(9)
                   + 2.890611442640554 * x * y * z * sh(10)
                   - 0.4570457994644658 * y * (4 * zz - xx - yy) * sh(11)
                   + 0.3731763325901154 * z * (2 * zz - 3 * xx - 3 * yy)
                   * sh(12)
                   - 0.4570457994644658 * x * (4 * zz - xx - yy) * sh(13)
                   + 1.445305721320277 * z * (xx - yy) * sh(14)
                   - 0.5900435899266435 * x * (xx - 3 * yy) * sh(15))
            out.append(res)
        return sum(jnp.sum(o) for o in out) * 1e-6

    def f_conf_gather(eps):
        flat = params.conf_static.reshape(-1) + eps[0]
        return jnp.sum(flat[meta.pix_id]) * 1e-6

    def f_ri_no_concat(eps):
        """raster_inputs minus the dc/rest -> [N,16,3] concat."""
        safe_rot = jnp.where(meta.alive[:, None], params.rotation,
                             jnp.asarray([1.0, 0, 0, 0], jnp.float32))
        p = params._replace(rotation=safe_rot, xyz=params.xyz + eps)
        w2c = pose_to_w2c(pose7)
        xyz_cam = jnp.matmul(p.xyz, w2c[:3, :3].T,
                             precision="highest") + w2c[:3, 3]
        rot_cam = quat_mul(pose7[:4], p.rotation)
        opacity = (activated_opacity(p)
                   * per_gaussian_conf(p, meta)[:, None]
                   * meta.alive[:, None])
        return (jnp.sum(xyz_cam) + jnp.sum(opacity) + jnp.sum(rot_cam)
                + jnp.sum(p.features_dc) + jnp.sum(p.features_rest) * 1e-6)

    def f_concat_shs(eps):
        sh_cat = jnp.concatenate(
            [params.features_dc + eps[0], params.features_rest], axis=1)
        return jnp.sum(sh_cat) * 1e-6

    rest_flat = jnp.asarray(params.features_rest.reshape(-1, 45))

    def f_add1_aos(eps):
        return jnp.sum(params.features_rest * 1.0001 + eps[0]) * 1e-6

    def f_add1_flat(eps):
        return jnp.sum(rest_flat * 1.0001 + eps[0]) * 1e-6

    # gather/scatter layout A/B: one [N,9]-row gather vs 9 dense gathers
    attr9 = jax.random.normal(jax.random.PRNGKey(1), (n, 9))
    attr_cols = [jnp.asarray(attr9[:, i]) for i in range(9)]

    def f_gather_rows9(eps):
        g = (attr9 + eps[0])[gid0]                     # [T, K, 9]
        return jnp.sum(jnp.swapaxes(g, 1, 2)) * 1e-6

    def f_gather_9dense(eps):
        cols = [(c + eps[0])[gid0] for c in attr_cols]  # 9 x [T, K]
        return jnp.sum(jnp.stack(cols, axis=1)) * 1e-6

    def f_scatter_add_9dense(eps):
        g = gtile + eps[0]                             # [T, 9, K]
        flat = gid0.reshape(-1)
        outs = [jnp.zeros((n,)).at[flat].add(g[:, i, :].reshape(-1))
                for i in range(9)]
        return sum(jnp.sum(o) for o in outs) * 1e-9

    # ---- SoA [9, N] layout experiments: lane-gather with indices shared
    # across the 9 sublane rows (output [9, T*K] minor unpadded) vs the
    # row-gather into [T, K, 9] (minor 9 -> 128 lane padding).
    attr9N = jnp.swapaxes(attr9, 0, 1)                    # [9, N]
    flat_gid = gid0.reshape(-1)                           # [T*K]
    gtile9flat = jnp.swapaxes(gtile, 0, 1).reshape(9, -1)  # [9, T*K]

    def f_gather_lanes9N(eps):
        out = (attr9N + eps[0])[:, flat_gid]             # [9, T*K]
        return jnp.sum(out) * 1e-6

    def f_scatter_add_lanes9N(eps):
        g = gtile9flat + eps[0]                          # [9, T*K]
        acc = jnp.zeros((9, n)).at[:, flat_gid].add(g)
        return jnp.sum(acc) * 1e-9

    def f_gather_take9N(eps):
        out = jnp.take((attr9N + eps[0]), flat_gid, axis=1)
        return jnp.sum(out) * 1e-6

    def f_scatter_add_segsum(eps):
        """Sort-based segment-sum alternative: sort slot grads by gid, then
        cumsum + boundary diff."""
        g = gtile + eps[0]
        flat = gid0.reshape(-1)
        order2 = jnp.argsort(flat)
        gs = jnp.cumsum(
            jnp.swapaxes(g, 1, 2).reshape(-1, 9)[order2], axis=0)
        bounds = jnp.searchsorted(flat[order2],
                                  jnp.arange(n + 1, dtype=jnp.int32))
        padded = jnp.concatenate([jnp.zeros((1, 9)), gs], 0)
        seg = padded[bounds[1:]] - padded[bounds[:-1]]
        return jnp.sum(seg) * 1e-9

    # ---- preprocess bisect: constant inputs (no raster_inputs glue), and
    # partial reductions so XLA DCEs everything not needed for the reduce.
    ri0 = jax.jit(raster_inputs)(jnp.zeros(3))
    ri0 = {k: jnp.asarray(jax.device_get(v)) for k, v in ri0.items()}

    def prep_const(eps):
        return preprocess_fn(
            ri0["means3d"] + eps, ri0["opacities"], s,
            viewmatrix=ri0["viewmatrix"], projmatrix=ri0["projmatrix"],
            campos=ri0["campos"], shs=ri0["shs"], scales=ri0["scales"],
            rotations=ri0["rotations"], tan_fovx=ri0["tan_fovx"],
            tan_fovy=ri0["tan_fovy"])

    def f_prepc_all(eps):
        return reduce_prep(prep_const(eps))

    def f_prepc_mean2d(eps):
        p = prep_const(eps)
        return jnp.sum(p.mean2d) + jnp.sum(p.depth)

    def f_prepc_conic(eps):
        p = prep_const(eps)
        return jnp.sum(p.conic)

    def f_prepc_color(eps):
        p = prep_const(eps)
        return jnp.sum(p.color)

    def f_prepc_rect(eps):
        p = prep_const(eps)
        return (jnp.sum(p.rect_min) + jnp.sum(p.rect_max)
                + jnp.sum(p.n_tiles_touched) + jnp.sum(p.radius)
                ).astype(jnp.float32)

    def f_prepc_binnable(eps):
        p = prep_const(eps)
        return jnp.sum(p.binnable).astype(jnp.float32) + jnp.sum(eps)

    stages = {
        "prep": f_prep,
        "prepc_all": f_prepc_all,
        "prepc_mean2d": f_prepc_mean2d,
        "prepc_conic": f_prepc_conic,
        "prepc_color": f_prepc_color,
        "prepc_rect": f_prepc_rect,
        "prepc_binnable": f_prepc_binnable,
        "ri": f_ri,
        "cov3d_einsum": f_cov3d_einsum,
        "cov3d_soa": f_cov3d_soa,
        "proj_matmul": f_proj_matmul,
        "proj_soa": f_proj_soa,
        "sh_aos": f_sh_aos,
        "sh_soa": f_sh_soa,
        "conf_gather": f_conf_gather,
        "ri_no_concat": f_ri_no_concat,
        "ri_saferot": lambda eps: jnp.sum(jnp.where(
            meta.alive[:, None], params.rotation + eps[0],
            jnp.asarray([1.0, 0, 0, 0], jnp.float32))) * 1e-6,
        "ri_saferot_mul": lambda eps: jnp.sum(
            (params.rotation + eps[0]) * meta.alive[:, None]
            + jnp.asarray([1.0, 0, 0, 0])
            * (1.0 - meta.alive[:, None])) * 1e-6,
        "ri_saferot_scalar": lambda eps: jnp.sum(jnp.where(
            meta.alive[:, None], params.rotation + eps[0], 0.0)) * 1e-6,
        "ri_saferot_prebroad": lambda eps: jnp.sum(jnp.where(
            jnp.broadcast_to(meta.alive[:, None], (n, 4)),
            params.rotation + eps[0],
            jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), (n, 4)))) * 1e-6,
        "ri_saferot_f32mask": lambda eps: jnp.sum(jnp.where(
            meta.alive.astype(jnp.float32)[:, None] > 0,
            params.rotation + eps[0],
            jnp.asarray([1.0, 0, 0, 0]))) * 1e-6,
        "ri_quatmul": lambda eps: jnp.sum(quat_mul(
            pose7[:4], params.rotation + eps[0])) * 1e-6,
        "ri_opacity": lambda eps: jnp.sum(
            activated_opacity(params)
            * (per_gaussian_conf(params, meta)[:, None] + eps[0])
            * meta.alive[:, None]) * 1e-6,
        "ri_xyzcam": lambda eps: jnp.sum(jnp.matmul(
            params.xyz + eps[0],
            pose_to_w2c(pose7)[:3, :3].T, precision="highest")
            + pose_to_w2c(pose7)[:3, 3]) * 1e-6,
        "concat_shs": f_concat_shs,
        "add1_aos": f_add1_aos,
        "add1_flat": f_add1_flat,
        "gather_rows9": f_gather_rows9,
        "gather_9dense": f_gather_9dense,
        "scatter_add_9dense": f_scatter_add_9dense,
        "scatter_add_segsum": f_scatter_add_segsum,
        "prep_bin": f_prep_bin,
        "prep_bin_fullsort": f_prep_bin_fullsort,
        "prep_bin_compact": f_prep_bin_compact,
        "prep_bin_gather": f_prep_bin_gather,
        "full_fwd": f_full_fwd,
        "full_fwd_bwd": f_full_fwd_bwd,
        "full_fwd_bwd_fullsort": f_full_fwd_bwd_fullsort,
        "es_bin": f_es_bin,
        "es_gather": f_es_gather,
        "es_fwd": f_es_fwd,
        "sort_E": f_sort_E,
        "sort_ND": f_sort_ND,
        "pairsort_E": f_pairsort_E,
        "scatter_sorted_only": f_scatter_sorted_only,
        "bwd_reduce_sorted": f_bwd_reduce_sorted,
        "scatter_min_small": f_scatter_min_small,
        "bwd_reduce_cumsum": f_bwd_reduce_cumsum,
        "ks_split": f_ks_split,
        "es_blend_bwd": f_es_blend_bwd,
        "gather_E_rows9": f_gather_E_rows9,
        "scatterN_from_E": f_scatterN_from_E,
        "scatter_clustered": f_scatter_clustered,
        "gather_clustered": f_gather_clustered,
        "remap_gather": f_remap_gather,
        "train1": f_train1,
        "gather_lanes9N": f_gather_lanes9N,
        "scatter_add_lanes9N": f_scatter_add_lanes9N,
        "gather_take9N": f_gather_take9N,
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
    best = float("inf")
    # the relay's FIRST timed window in a process (and sporadic later ones)
    # carries a ~15 ms artifact — time several windows, keep the fastest
    for k in range(3):
        t0 = time.perf_counter()
        out = chain(c + 1e-6 * (k + 1))
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    global N_GAUSSIANS, HEIGHT, WIDTH, PROBE
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--stages", type=str, default="")
    ap.add_argument("--n", type=int, default=N_GAUSSIANS)
    ap.add_argument("--height", type=int, default=HEIGHT)
    ap.add_argument("--width", type=int, default=WIDTH)
    ap.add_argument("--probe", action="store_true",
                    help="size entry caps with the per-scene probe "
                         "(bench_large_step.py parity)")
    args = ap.parse_args()
    N_GAUSSIANS, HEIGHT, WIDTH = args.n, args.height, args.width
    PROBE = args.probe
    stages = build()
    wanted = (args.stages.split(",") if args.stages
              else list(stages.keys()))
    for name in wanted:
        ms = time_stage(stages[name], args.iters)
        print(f"{name:24s} {ms:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
