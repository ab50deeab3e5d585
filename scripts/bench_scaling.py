#!/usr/bin/env python
"""Multi-chip rays/s scaling benchmark (BASELINE config[4] reporting tool).

Runs the tile-sharded render across growing sub-meshes of the available
devices and reports rays/s per configuration plus linear-scaling efficiency.
On the CPU backend (virtual devices) this validates plumbing only; run on a
real slice for meaningful numbers.

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
    ap.add_argument("--gaussians", type=int, default=200_000)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true",
                    help="force the 8-device virtual CPU mesh")
    ap.add_argument("--mode", choices=("render", "train"), default="render",
                    help="render: tile-sharded forward; train: full "
                    "fwd+bwd+Adam step with the Gaussian axis sharded "
                    "over all devices (BASELINE config[4] axis)")
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
    from das3r_tpu.parallel import make_mesh, sharded

    n_dev = len(jax.devices())
    settings = RasterSettings(
        image_height=args.height, image_width=args.width, sh_degree=3,
        max_per_tile=512, max_tiles_per_gaussian=16,
        max_total_entries=4 * args.gaussians)
    params, meta, poses = random_gaussian_scene(
        n=args.gaussians, n_frames=2, height=args.height, width=args.width)
    bg = jnp.zeros(3)
    fov = jnp.asarray(1.0)
    rays = args.height * args.width

    results = {}
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev]
    for nd in sizes:
        if args.mode == "train":
            from das3r_tpu.train import step as step_mod
            from das3r_tpu.train.config import OptimizationConfig
            mesh = make_mesh(data=1, gauss=nd, tile=1,
                             devices=jax.devices()[:nd])
            cfg = OptimizationConfig(psnr_threshold=5.0)
            state = step_mod.init_train_state(params, poses)
            uids = jnp.zeros((1,), jnp.int32)
            fovs = jnp.ones(1)
            gts = jnp.zeros((1, 3, args.height, args.width))
            with jax.sharding.set_mesh(mesh):
                step = sharded.make_sharded_train_step(
                    mesh, settings, cfg,
                    gauss_axis="gauss" if nd > 1 else None)
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
        results[nd] = rps
        print(json.dumps({"devices": nd, "mode": args.mode,
                          "rays_per_s": round(rps),
                          "ms_per_iter": round(dt / args.iters * 1000, 2)}))

    base = results[sizes[0]]
    eff = {nd: results[nd] / (base * nd / sizes[0]) for nd in sizes}
    print(json.dumps({"scaling_efficiency": {str(k): round(v, 3)
                                             for k, v in eff.items()},
                      "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
