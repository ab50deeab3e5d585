#!/usr/bin/env python
"""A/B bench: entry-stream rasterizer with the fp32 vs bf16 attribute
table (``RasterSettings.table_bf16``, VERDICT r2 missing list item on the
PERF.md roadmap #4 — bf16 storage, fp32 accumulation).

Same-process A/B with bench.py's chained-scan protocol (each iteration's
pose depends on the previous gradient, all iterations in one dispatch) —
the only comparison trusted through the axon relay (docs/PERF.md
"Measurement reliability warning"). Also reports the forward-image
quantization error of the bf16 table against the fp32 render on identical
inputs (expected ~2e-3 max: bf16 color/opacity ulp; see entry_blend.py).

Prints one JSON line per mode plus a summary line.
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
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--windows", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from das3r_tpu.data.synthetic import random_gaussian_scene
    from das3r_tpu.models import autosize
    from das3r_tpu.models import render as render_mod
    from das3r_tpu.ops.splat import RasterSettings
    from das3r_tpu.train import loss as loss_mod

    H, W, N = args.height, args.width, args.n
    settings = RasterSettings(
        image_height=H, image_width=W, sh_degree=3,
        max_per_tile=1024, max_tiles_per_gaussian=32,
        max_total_entries=8 * N)
    params, meta, poses = random_gaussian_scene(
        n=N, n_frames=2, height=H, width=W, seed=0)
    settings = dataclasses.replace(
        settings, max_total_entries=autosize.auto_entry_cap(
            params, meta, settings, poses.all_poses(),
            jnp.asarray(1.0), jnp.asarray(1.0)))
    bg = jnp.zeros(3)
    fov = jnp.asarray(1.0, jnp.float32)
    gt = jnp.zeros((3, H, W))
    pose = poses.pose(0)

    def make_chain(s):
        def loss_fn(p, pose7):
            out = render_mod.render(p, meta, s, pose7, bg, fov, fov,
                                    mode="train", backend="pallas")
            ph = loss_mod.photometric_loss(out.image, gt,
                                           p.conf_static[0])
            return ph.loss

        def one(pose7):
            g_params, g_pose = jax.grad(loss_fn, argnums=(0, 1))(
                params, pose7)
            return pose7 + 1e-12 * (jnp.sum(g_pose)
                                    + jnp.sum(g_params.xyz))

        @jax.jit
        def chain(pose7):
            c, _ = jax.lax.scan(lambda c, _: (one(c), ()), pose7, None,
                                length=args.iters)
            return c
        return chain

    # forward quantization error on identical inputs
    def render_img(s):
        return jax.jit(lambda: render_mod.render(
            params, meta, s, pose, bg, fov, fov, mode="train",
            backend="pallas").image)()

    s32 = settings
    s16 = dataclasses.replace(settings, table_bf16=True)
    import numpy as np
    img32 = np.asarray(render_img(s32))
    img16 = np.asarray(render_img(s16))
    err = np.abs(img16 - img32)

    results = {}
    for name, s in (("fp32_table", s32), ("bf16_table", s16)):
        chain = make_chain(s)
        jax.block_until_ready(chain(pose))          # compile + warm
        dt = float("inf")
        for k in range(args.windows):
            t0 = time.perf_counter()
            out = chain(pose + 1e-6 * (k + 1))
            jax.block_until_ready(out)
            dt = min(dt, time.perf_counter() - t0)
        ms = dt / args.iters * 1e3
        mpix = H * W * args.iters / dt / 1e6
        results[name] = ms
        print(json.dumps({
            "metric": f"entry_stream_fwd_bwd_ms_per_iter_{name}",
            "value": round(ms, 2), "unit": "ms/iter",
            "detail": {"n": N, "hw": [H, W],
                       "mpix_per_s": round(mpix, 3)}}), flush=True)

    print(json.dumps({
        "metric": "bf16_table_speedup",
        "value": round(results["fp32_table"] / results["bf16_table"], 4),
        "unit": "x",
        "detail": {"fwd_img_max_abs_err": float(err.max()),
                   "fwd_img_mean_abs_err": float(err.mean())}}))


if __name__ == "__main__":
    main()
