#!/usr/bin/env python
"""Round-2 on-TPU validation battery (run when the axon relay is up).

One process, serialized (NEVER run two TPU processes at once — the second
init gets UNAVAILABLE and can wedge the relay). Sections, each skippable
via --skip:

  parity   oracle parity of the pallas backend: tight binning on/off,
           DMA vs padded-aligned windows
  stages   scan-chained stage breakdown at the bench config
  ab       A/B: use_dma_windows on/off full-step timing
  bench    bench.py equivalent (steady-state Mpix/s)

Prints one line per check; exits nonzero on a parity failure.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))


def check_parity():
    import numpy as np
    from das3r_tpu.ops.splat import RasterSettings
    from tests.test_splat import make_scene, run_both

    ok = True
    rng = np.random.default_rng(42)
    base = RasterSettings(image_height=128, image_width=128, sh_degree=0,
                          max_per_tile=1024, max_tiles_per_gaussian=64)
    means, scales, rots, ops, colors = make_scene(1000, rng)
    for tight in (True, False):
        for dma in (True, False):
            s = dataclasses.replace(base, tight_binning=tight,
                                    use_dma_windows=dma)
            img, radii, ref_img, ref_radii, aux = run_both(
                s, means, scales, rots, ops, colors)
            d = float(np.abs(img - ref_img).max())
            line_ok = d < 5e-4
            ok &= line_ok
            print(f"parity tight={tight} dma={dma}: maxdiff={d:.2e} "
                  f"overflow={int(aux.tile_overflow)} "
                  f"{'OK' if line_ok else 'FAIL'}", flush=True)
    return ok


def run_stages(stages):
    import subprocess
    subprocess.run([sys.executable, "-u",
                    os.path.join(os.path.dirname(__file__),
                                 "bench_raster_stages.py"),
                    "--iters", "30", "--stages", stages], check=False)


def run_ab():
    """Full-step timing with DMA vs padded-aligned windows."""
    import jax
    import jax.numpy as jnp
    from das3r_tpu.data.synthetic import random_gaussian_scene
    from das3r_tpu.models import render as render_mod
    from das3r_tpu.ops.splat import RasterSettings
    from das3r_tpu.train import loss as loss_mod

    H, W, N, ITERS = 384, 512, 100_000, 30
    params, meta, poses = random_gaussian_scene(n=N, n_frames=2,
                                                height=H, width=W, seed=0)
    bg = jnp.zeros(3)
    fov = jnp.asarray(1.0, jnp.float32)
    gt = jnp.zeros((3, H, W))
    pose = poses.pose(0)

    for dma in (True, False):
        settings = RasterSettings(
            image_height=H, image_width=W, sh_degree=3,
            max_per_tile=1024, max_tiles_per_gaussian=32,
            max_total_entries=8 * N, use_dma_windows=dma)

        def loss_fn(params, pose7):
            out = render_mod.render(params, meta, settings, pose7, bg,
                                    fov, fov, mode="train")
            return loss_mod.photometric_loss(out.image, gt,
                                             params.conf_static[0]).loss

        def one(pose7):
            g_params, g_pose = jax.grad(loss_fn, argnums=(0, 1))(params,
                                                                 pose7)
            return pose7 + 1e-12 * (jnp.sum(g_pose) + jnp.sum(g_params.xyz))

        @jax.jit
        def chain(pose7):
            c, _ = jax.lax.scan(lambda c, _: (one(c), ()), pose7, None,
                                length=ITERS)
            return c

        jax.block_until_ready(chain(pose))
        best = float("inf")
        for k in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(pose + 1e-6 * (k + 1)))
            best = min(best, time.perf_counter() - t0)
        ms = best / ITERS * 1e3
        print(f"ab use_dma_windows={dma}: {ms:.2f} ms/iter "
              f"({H * W * ITERS / best / 1e6:.2f} Mpix/s)", flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--skip", default="", help="comma list of sections")
    ap.add_argument("--stages",
                    default="prep,prep_bin,prep_bin_gather,full_fwd,"
                            "full_fwd_bwd")
    args = ap.parse_args(argv)
    skip = set(args.skip.split(",")) if args.skip else set()

    ok = True
    if "parity" not in skip:
        ok &= check_parity()
    if "stages" not in skip:
        run_stages(args.stages)
    if "ab" not in skip:
        run_ab()
    if "bench" not in skip:
        import subprocess
        subprocess.run([sys.executable, "-u", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench.py")], check=False)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
