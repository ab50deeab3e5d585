#!/usr/bin/env python
"""Multi-chip scaling benchmark (BASELINE config[4] reporting tool).

Three measurement modes, composable:

- strong scaling (default): fixed total work, growing sub-meshes;
  efficiency = speedup / devices. On the virtual CPU mesh this measures
  HOST OVERSUBSCRIPTION (4 cores pretending to be 8 devices), not
  interconnect — honest only on a real slice.
- ``--weak``: fixed work PER DEVICE (tiles for render mode, Gaussians for
  train mode) — perfect scaling is FLAT ms/iter, so the efficiency
  column is base_ms / ms instead of a throughput ratio. Still
  host-limited on CPU, but the saner protocol for a future real slice.
- ``--collectives``: skip timing entirely and report the compiled
  per-step COMMUNICATION VOLUME (bytes per collective family, from the
  optimized HLO — ``parallel/hlo_stats.py``). This is
  backend-independent: the same GSPMD partitioning emits the same
  collectives on CPU and TPU meshes, so the table bounds what a real
  slice must move over ICI even though this box cannot measure ICI.

Prints one JSON line per mesh size and a summary line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gaussians", type=int, default=200_000,
                    help="total (strong) or per-device (weak, train mode)")
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true",
                    help="force the 8-device virtual CPU mesh")
    ap.add_argument("--mode", choices=("render", "train"), default="render",
                    help="render: tile-sharded forward; train: full "
                    "fwd+bwd+Adam step with the Gaussian axis sharded "
                    "over all devices (BASELINE config[4] axis)")
    ap.add_argument("--weak", action="store_true",
                    help="weak scaling: fixed work per device (render: "
                    "--height rows of tiles per device; train: "
                    "--gaussians per device)")
    ap.add_argument("--collectives", action="store_true",
                    help="report compiled per-step collective bytes "
                    "instead of timing")
    args = ap.parse_args(argv)

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from das3r_tpu.data.synthetic import random_gaussian_scene
    from das3r_tpu.ops.splat import RasterSettings
    from das3r_tpu.parallel import hlo_stats, make_mesh, sharded

    n_dev = len(jax.devices())
    results = {}
    rows = []
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev]
    for nd in sizes:
        # per-size problem dimensions
        if args.weak and args.mode == "train":
            n_gauss = args.gaussians * nd
        else:
            n_gauss = args.gaussians
        if args.weak and args.mode == "render":
            height = args.height * nd
        else:
            height = args.height
        settings = RasterSettings(
            image_height=height, image_width=args.width, sh_degree=3,
            max_per_tile=512, max_tiles_per_gaussian=16,
            max_total_entries=4 * n_gauss)
        params, meta, poses = random_gaussian_scene(
            n=n_gauss, n_frames=2, height=height, width=args.width)
        bg = jnp.zeros(3)
        fov = jnp.asarray(1.0)
        rays = height * args.width
        rec = {"devices": nd, "mode": args.mode,
               "weak": bool(args.weak), "gaussians": n_gauss,
               "tiles": settings.n_tiles}

        if args.mode == "train":
            from das3r_tpu.train import step as step_mod
            from das3r_tpu.train.config import OptimizationConfig
            mesh = make_mesh(data=1, gauss=nd, tile=1,
                             devices=jax.devices()[:nd])
            cfg = OptimizationConfig(psnr_threshold=5.0)
            state = step_mod.init_train_state(params, poses)
            uids = jnp.zeros((1,), jnp.int32)
            fovs = jnp.ones(1)
            gts = jnp.zeros((1, 3, height, args.width))
            with jax.sharding.set_mesh(mesh):
                step = sharded.make_sharded_train_step(
                    mesh, settings, cfg,
                    gauss_axis="gauss" if nd > 1 else None)
                if args.collectives:
                    txt = step.lower(state, meta, uids, gts, fovs, fovs,
                                     bg).compile().as_text()
                    rec["collectives"] = hlo_stats.collective_bytes(txt)
                    rec["collective_bytes_total"] = (
                        hlo_stats.total_collective_bytes(txt))
                    rows.append(rec)
                    print(json.dumps(rec), flush=True)
                    continue
                st, m = step(state, meta, uids, gts, fovs, fovs, bg)
                jax.block_until_ready(st.params.xyz)
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    st, m = step(st, meta, uids, gts, fovs, fovs, bg)
                jax.block_until_ready(st.params.xyz)
                dt = time.perf_counter() - t0
        else:
            mesh = make_mesh(data=1, tile=nd, devices=jax.devices()[:nd])
            with jax.sharding.set_mesh(mesh):
                render_fn = sharded.make_sharded_render(mesh, settings)
                pose = poses.pose(0)
                if args.collectives:
                    txt = render_fn.lower(params, meta, pose, bg, fov,
                                          fov).compile().as_text()
                    rec["collectives"] = hlo_stats.collective_bytes(txt)
                    rec["collective_bytes_total"] = (
                        hlo_stats.total_collective_bytes(txt))
                    rows.append(rec)
                    print(json.dumps(rec), flush=True)
                    continue
                img = render_fn(params, meta, pose, bg, fov, fov)
                jax.block_until_ready(img)
                t0 = time.perf_counter()
                p = pose
                for _ in range(args.iters):
                    img = render_fn(params, meta, p, bg, fov, fov)
                    p = pose + 1e-12 * img.sum()
                jax.block_until_ready(p)
                dt = time.perf_counter() - t0
        rps = rays * args.iters / dt
        results[nd] = (rps, dt / args.iters * 1000)
        rec["rays_per_s"] = round(rps)
        rec["ms_per_iter"] = round(dt / args.iters * 1000, 2)
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    if args.collectives:
        print(json.dumps({"summary": "collective_bytes",
                          "backend": jax.default_backend()}))
        return
    base_rps, base_ms = results[sizes[0]]
    if args.weak:
        # perfect weak scaling = flat ms/iter
        eff = {nd: base_ms / results[nd][1] for nd in sizes}
    else:
        eff = {nd: results[nd][0] / (base_rps * nd / sizes[0])
               for nd in sizes}
    print(json.dumps({"scaling_efficiency": {str(k): round(v, 3)
                                             for k, v in eff.items()},
                      "weak": bool(args.weak),
                      "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
