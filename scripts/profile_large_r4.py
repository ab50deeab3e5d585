"""Stage breakdown of the production-scale train step (default 1.5M
Gaussians, 288x512) on TPU — the <0.7 s/iter roadmap needs per-stage
numbers, and jax.profiler traces are awkward to mine headless over the
relay. Times nested prefixes of the step with the chained-scan protocol
(each stage's output feeds the next iteration's input so nothing is
memoized; every window ends in a scalar host fetch):

  prep     preprocess only (cull/project/conic/SH)
  keys     + sorted key stream (dup table emit + global sort)
  stream   + chunk extraction (searchsorted/rotate -> EntryStream)
  fwd      + attribute table + Pallas blend forward
  fwdbwd   full render fwd + bwd (grads to all params and the pose)
  step     full train step incl. photometric loss + both Adam groups

Successive deltas are the stage costs. Prints one JSON line per stage.
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
    ap.add_argument("--stages", nargs="*", default=None,
                    help="subset of stages to run (default: all)")
    ap.add_argument("--no-heavy", action="store_true")
    ap.add_argument("--no-segsum", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from das3r_tpu.data.synthetic import random_gaussian_scene
    from das3r_tpu.models import autosize
    from das3r_tpu.models import render as render_mod
    from das3r_tpu.ops.splat import RasterSettings, binning
    from das3r_tpu.ops.splat.preprocess import preprocess as preprocess_fn
    from das3r_tpu.ops.splat import entry_blend
    from das3r_tpu.train import loss as loss_mod
    from das3r_tpu.train import step as step_mod
    from das3r_tpu.train.config import OptimizationConfig
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
    split = ({"heavy_rows_cap": None} if args.no_heavy else
             autosize.auto_split_table(stats, N, dup_cap))
    settings = dataclasses.replace(
        settings,
        max_total_entries=-(-max(int(stats.max_total * 1.2), 8192)
                            // 1024) * 1024,
        max_tiles_per_gaussian=dup_cap,
        segsum_grad_reduce=not args.no_segsum, **split)
    print(f"# n={N} cap={settings.max_total_entries} dup={dup_cap} "
          f"light={settings.light_dup_width} "
          f"heavy={settings.heavy_rows_cap} hist={stats.dup_hist}",
          flush=True)

    bg = jnp.zeros(3)
    gt = jnp.zeros((3, H, W))
    pose0 = poses.pose(0)
    e_al = binning.entry_stream_cap(settings, N)

    def run_prep(p7):
        w2c = pose_to_w2c(p7)
        xyz_cam = jnp.matmul(params.xyz, w2c[:3, :3].T,
                             precision="highest") + w2c[:3, 3]
        rot_cam = quat_mul(p7[:4], params.rotation)
        from das3r_tpu.models.gaussians import (activated_opacity,
                                                activated_scaling)
        proj = transforms.projection_matrix_dyn(0.01, 100.0, fov, fov).T
        shs = jnp.concatenate([params.features_dc, params.features_rest], 1)
        return preprocess_fn(
            xyz_cam, activated_opacity(params), settings,
            viewmatrix=jnp.eye(4), projmatrix=proj,
            campos=jnp.zeros(3), shs=shs, colors_precomp=None,
            scales=activated_scaling(params), rotations=rot_cam,
            cov3d_precomp=None, mean2d_offset=None,
            tan_fovx=jnp.tan(fov / 2), tan_fovy=jnp.tan(fov / 2))

    def probe_prep(p7):
        p = run_prep(p7)
        return jnp.sum(p.depth) + jnp.sum(p.mean2d) + jnp.sum(p.color)

    def probe_keys(p7):
        p = run_prep(p7)
        ks = binning._sorted_key_stream(jax.lax.stop_gradient(p), settings)
        return (jnp.sum(ks.sorted_packed[:: 1024].astype(jnp.float32))
                + jnp.sum(p.color))

    def probe_stream(p7):
        p = run_prep(p7)
        ks = binning._sorted_key_stream(jax.lax.stop_gradient(p), settings)
        es = binning.entry_stream_from_keys(ks, settings, N, e_al)
        return (jnp.sum(es.rank[:: 1024].astype(jnp.float32))
                + jnp.sum(es.count.astype(jnp.float32)) + jnp.sum(p.color))

    def probe_fwd(p7):
        out = render_mod.render(params, meta, settings, p7, bg, fov, fov,
                                mode="train")
        return jnp.sum(out.image)

    def probe_fwdbwd(p7):
        def f(pp, p7_):
            out = render_mod.render(pp, meta, settings, p7_, bg, fov, fov,
                                    mode="train")
            return jnp.sum(out.image)
        gp, g7 = jax.grad(f, argnums=(0, 1))(params, p7)
        return jnp.sum(g7) + jnp.sum(gp.xyz)

    stages = {"prep": probe_prep, "keys": probe_keys,
              "stream": probe_stream, "fwd": probe_fwd,
              "fwdbwd": probe_fwdbwd}

    def timed_scan(name, fn):
        @jax.jit
        def chain(p7):
            def body(c, _):
                v = fn(c)
                return c + 1e-13 * v, ()
            c, _ = jax.lax.scan(body, p7, None, length=args.iters)
            return jnp.sum(c)

        t0 = time.time()
        _ = float(chain(pose0))
        print(f"# {name} compile+first {time.time() - t0:.1f} s",
              flush=True)
        dt = float("inf")
        for k in range(args.windows):
            t0 = time.perf_counter()
            _ = float(chain(pose0 + 1e-6 * (k + 1)))
            dt = min(dt, time.perf_counter() - t0)
        ms = dt / args.iters * 1e3
        print(json.dumps({"stage": name, "ms_per_iter": round(ms, 1)}),
              flush=True)
        return ms

    wanted = args.stages or list(stages) + ["step"]
    for name in wanted:
        if name == "step":
            cfg = OptimizationConfig(iterations=4000)
            state = step_mod.init_train_state(params, poses)
            gts = jnp.zeros((2, 3, H, W))
            fovs = jnp.full((2,), 1.0)
            uids = jnp.zeros((args.iters,), jnp.int32)

            def run(state):
                state, _, m = step_mod.train_chunk(
                    state, meta, uids, gts, fovs, fovs, bg, settings, cfg)
                return state, m

            t0 = time.time()
            state, m = run(state)
            _ = float(jnp.sum(m.loss))
            print(f"# step compile+first {time.time() - t0:.1f} s",
                  flush=True)
            dt = float("inf")
            for _k in range(args.windows):
                t0 = time.perf_counter()
                state, m = run(state)
                _ = float(jnp.sum(m.loss))
                dt = min(dt, time.perf_counter() - t0)
            print(json.dumps({"stage": "step",
                              "ms_per_iter":
                              round(dt / args.iters * 1e3, 1)}),
                  flush=True)
        else:
            timed_scan(name, stages[name])


if __name__ == "__main__":
    main()
