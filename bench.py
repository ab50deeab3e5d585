"""Benchmark: rasterizer fwd+bwd throughput at 100k Gaussians (the
BASELINE.json headline metric), run on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured against BENCH_TARGET_MPIX (the reference CUDA
rasterizer has no published throughput — SURVEY.md §6 — so the target is
our own recorded single-chip goal; >1.0 means faster than target).
"""
import json
import time

import jax
import jax.numpy as jnp

# Nominal single-chip target for fwd+bwd Mpixels/s at 100k Gaussians.
# INRIA's CUDA rasterizer trains ~25-35 iters/s at ~0.2 Mpix on consumer
# GPUs => ~5-7 Mpix/s fwd+bwd; we set the bar at parity with that.
BENCH_TARGET_MPIX = 6.0

N_GAUSSIANS = 100_000
HEIGHT, WIDTH = 384, 512
ITERS = 30


def main():
    from das3r_tpu.data.synthetic import random_gaussian_scene
    from das3r_tpu.models import render as render_mod
    from das3r_tpu.ops.splat import RasterSettings
    from das3r_tpu.train import loss as loss_mod

    from das3r_tpu.models import autosize

    settings = RasterSettings(
        image_height=HEIGHT, image_width=WIDTH, sh_degree=3,
        max_per_tile=1024, max_tiles_per_gaussian=32,
        max_total_entries=8 * N_GAUSSIANS)
    params, meta, poses = random_gaussian_scene(
        n=N_GAUSSIANS, n_frames=2, height=HEIGHT, width=WIDTH, seed=0)
    # the trainer's default per-scene capacity probe (scene_setup.py):
    # sizes the entry stream from measured occupancy; the stream path is
    # EXACT (no per-tile truncation, unlike the round-1 [T, K] config)
    import dataclasses
    stats = autosize.probe_capacities(
        params, meta, settings, poses.all_poses(),
        jnp.asarray(1.0), jnp.asarray(1.0))
    dup_cap = min(-(-max(int(stats.max_dup * 1.3), 8) // 4) * 4,
                  settings.max_tiles_per_gaussian)
    settings = dataclasses.replace(
        settings,
        max_total_entries=-(-max(int(stats.max_total * 1.2), 8192)
                            // 1024) * 1024,
        # the probed per-Gaussian footprint bounds the binning sort
        # domain (N x cap slots) — see models/autosize.auto_dup_cap
        max_tiles_per_gaussian=dup_cap,
        # split dup table only where it wins (no-split below break-even —
        # measured 3.4 ms/iter loss at this 100k scene, ab_regress_r4)
        **autosize.auto_split_table(stats, N_GAUSSIANS, dup_cap))
    bg = jnp.zeros(3)
    fov = jnp.asarray(1.0, jnp.float32)
    gt = jnp.zeros((3, HEIGHT, WIDTH))

    def loss_fn(params, pose7):
        out = render_mod.render(params, meta, settings, pose7, bg, fov, fov,
                                mode="train")
        ph = loss_mod.photometric_loss(out.image, gt,
                                       params.conf_static[0])
        return ph.loss

    # Each iteration's pose depends on the previous iteration's gradient:
    # the chain defeats any execution memoization in the device transport
    # and forces sequential execution, so wall-clock / iters is honest.
    # All ITERS iterations run inside ONE lax.scan dispatch — exactly how
    # the trainer executes (scan-chunked epochs) — so per-dispatch relay
    # latency (~10 ms/call through axon) is excluded from the measurement.
    def one(pose7):
        g_params, g_pose = jax.grad(loss_fn, argnums=(0, 1))(params, pose7)
        return pose7 + 1e-12 * (jnp.sum(g_pose) + jnp.sum(g_params.xyz))

    @jax.jit
    def chain(pose7):
        c, _ = jax.lax.scan(lambda c, _: (one(c), ()), pose7, None,
                            length=ITERS)
        return c

    pose = poses.pose(0)
    jax.block_until_ready(chain(pose))       # compile + warm up

    # Steady-state throughput: the relay's first timed window after compile
    # carries a one-off ~300 ms artifact (docs/PERF.md), so run several
    # windows and keep the fastest. Every window is a fresh 30-iteration
    # chained run with different inputs — no memoization is possible.
    dt = float("inf")
    for k in range(4):
        t0 = time.perf_counter()
        p = chain(pose + 1e-6 * (k + 1))
        jax.block_until_ready(p)
        dt = min(dt, time.perf_counter() - t0)

    mpix_s = HEIGHT * WIDTH * ITERS / dt / 1e6
    print(json.dumps({
        "metric": "rasterizer_fwd_bwd_mpixels_per_s_100k_gaussians",
        "value": round(mpix_s, 3),
        "unit": "Mpixels/s/chip",
        "vs_baseline": round(mpix_s / BENCH_TARGET_MPIX, 3),
    }))


if __name__ == "__main__":
    main()
