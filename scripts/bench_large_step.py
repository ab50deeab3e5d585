#!/usr/bin/env python
"""Full TRAIN-STEP throughput at production scale (default 1.5M Gaussians,
288x512 — the dense-init scale of a 50-frame DAVIS scene, docs/PERF.md
"Known ceilings").

Round-1 recorded ~2.1 s/iter (0.47 it/s) at this scale with the [T, K]
rasterizer; the round-2 bar (VERDICT item 1) is < 0.7 s/iter. This script
measures the REAL trainer step (render -> conf-weighted L1+SSIM -> grads
-> both Adam groups, ``train/step.py:train_chunk``) with the entry-stream
rasterizer and the per-scene capacity probe, using the chained scan
protocol from bench.py (sequential execution, no relay memoization).

Prints one BENCH-style JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TARGET_S_PER_ITER = 0.7


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=1_500_000)
    ap.add_argument("--height", type=int, default=288)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10,
                    help="iterations per timed scan chunk")
    ap.add_argument("--windows", type=int, default=3,
                    help="timed windows (best kept)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-heavy", action="store_true",
                    help="disable the split-width dup table")
    ap.add_argument("--no-segsum", action="store_true",
                    help="disable the segsum gradient reduce")
    args = ap.parse_args(argv)

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=1")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp

    from das3r_tpu.data.synthetic import random_gaussian_scene
    from das3r_tpu.models import autosize
    from das3r_tpu.ops.splat import RasterSettings
    from das3r_tpu.train import step as step_mod
    from das3r_tpu.train.config import OptimizationConfig

    H, W, N = args.height, args.width, args.n
    settings = RasterSettings(image_height=H, image_width=W, sh_degree=3,
                              max_per_tile=1024, max_tiles_per_gaussian=32,
                              max_total_entries=8 * N)
    params, meta, poses = random_gaussian_scene(
        n=N, n_frames=2, height=H, width=W, seed=0)
    pose7s = poses.all_poses()
    fov = jnp.asarray(1.0, jnp.float32)
    stats = autosize.probe_capacities(params, meta, settings, pose7s,
                                      fov, fov)
    dup_cap = min(-(-max(int(stats.max_dup * 1.3), 8) // 4) * 4,
                  settings.max_tiles_per_gaussian)
    split = ({"heavy_rows_cap": None} if args.no_heavy else
             autosize.auto_split_table(stats, N, dup_cap))
    settings = dataclasses.replace(
        settings,
        max_total_entries=-(-max(int(stats.max_total * 1.2), 8192)
                            // 1024) * 1024,
        max_tiles_per_gaussian=dup_cap,
        segsum_grad_reduce=not args.no_segsum, **split)
    print(f"# n={N} entries_cap={settings.max_total_entries} "
          f"dup_cap={settings.max_tiles_per_gaussian} "
          f"light={settings.light_dup_width} "
          f"heavy_cap={settings.heavy_rows_cap}", flush=True)

    cfg = OptimizationConfig(iterations=4000)
    state = step_mod.init_train_state(params, poses)
    gt_images = jnp.zeros((2, 3, H, W), jnp.float32)
    fovs = jnp.full((2,), 1.0, jnp.float32)
    bg = jnp.zeros(3)
    uids = jnp.zeros((args.iters,), jnp.int32)

    def run(state):
        state, _, metrics = step_mod.train_chunk(
            state, meta, uids, gt_images, fovs, fovs, bg, settings, cfg)
        return state, metrics

    # block_until_ready does NOT reliably barrier through the axon relay
    # (docs/PERF.md round-3 measurement trap (b)); only a scalar host
    # fetch does. Windows chain through `state`, so each fetch forces the
    # whole window's computation.
    t0 = time.time()
    state, m = run(state)
    _ = float(jnp.sum(m.loss))
    print(f"# compile+first window {time.time() - t0:.1f} s", flush=True)

    dt = float("inf")
    for _ in range(args.windows):
        t0 = time.perf_counter()
        state, m = run(state)
        _ = float(jnp.sum(m.loss))
        dt = min(dt, time.perf_counter() - t0)

    s_per_iter = dt / args.iters
    print(json.dumps({
        "metric": f"full_train_step_s_per_iter_{N}_gaussians",
        "value": round(s_per_iter, 4),
        "unit": "s/iter",
        "vs_baseline": round(TARGET_S_PER_ITER / s_per_iter, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
