"""Round-4 regression hunt: A/B the round-3 rasterizer feature flags.

BENCH_r03 recorded 5.039 Mpix/s vs 6.126 in round 2 — one of the round-3
additions (split-width dup table, segsum grad reduce, probed
max_tiles_per_gaussian) regressed the single-chip bench scene. Times the
exact bench.py chain under each flag combination in ONE process so the
relay/compile overheads are comparable.
"""
import dataclasses
import json
import time

import jax
import jax.numpy as jnp

N_GAUSSIANS = 100_000
HEIGHT, WIDTH = 384, 512
ITERS = 30


def main():
    from das3r_tpu.data.synthetic import random_gaussian_scene
    from das3r_tpu.models import render as render_mod
    from das3r_tpu.models import autosize
    from das3r_tpu.ops.splat import RasterSettings
    from das3r_tpu.train import loss as loss_mod

    base = RasterSettings(
        image_height=HEIGHT, image_width=WIDTH, sh_degree=3,
        max_per_tile=1024, max_tiles_per_gaussian=32,
        max_total_entries=8 * N_GAUSSIANS)
    params, meta, poses = random_gaussian_scene(
        n=N_GAUSSIANS, n_frames=2, height=HEIGHT, width=WIDTH, seed=0)
    mx_total, _, mx_dup, mx_heavy = autosize.probe_entry_stats(
        params, meta, base, poses.all_poses(),
        jnp.asarray(1.0), jnp.asarray(1.0))
    cap_total = -(-max(int(mx_total * 1.2), 8192) // 1024) * 1024
    cap_dup = min(-(-max(int(mx_dup * 1.3), 8) // 4) * 4, 32)
    cap_heavy = autosize.auto_heavy_cap(mx_heavy)
    print(f"probe: total={mx_total} dup={mx_dup} heavy={mx_heavy} -> "
          f"cap_total={cap_total} cap_dup={cap_dup} cap_heavy={cap_heavy}")

    bg = jnp.zeros(3)
    fov = jnp.asarray(1.0, jnp.float32)
    gt = jnp.zeros((3, HEIGHT, WIDTH))
    pose = poses.pose(0)

    def timed(settings, tag):
        def loss_fn(params, pose7):
            out = render_mod.render(params, meta, settings, pose7, bg,
                                    fov, fov, mode="train")
            ph = loss_mod.photometric_loss(out.image, gt,
                                           params.conf_static[0])
            return ph.loss

        def one(pose7):
            g_params, g_pose = jax.grad(loss_fn, argnums=(0, 1))(
                params, pose7)
            return pose7 + 1e-12 * (jnp.sum(g_pose) + jnp.sum(g_params.xyz))

        @jax.jit
        def chain(pose7):
            c, _ = jax.lax.scan(lambda c, _: (one(c), ()), pose7, None,
                                length=ITERS)
            return c

        jax.block_until_ready(chain(pose))
        dt = float("inf")
        for k in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(pose + 1e-6 * (k + 1)))
            dt = min(dt, time.perf_counter() - t0)
        mpix = HEIGHT * WIDTH * ITERS / dt / 1e6
        print(json.dumps({"tag": tag, "ms_per_iter": round(dt / ITERS * 1e3, 2),
                          "mpix_s": round(mpix, 3)}), flush=True)
        return mpix

    common = dict(max_total_entries=cap_total)
    configs = {
        # r03 bench config (all round-3 features on)
        "r3_full": dict(max_tiles_per_gaussian=cap_dup,
                        heavy_rows_cap=cap_heavy),
        # split table off
        "no_heavy": dict(max_tiles_per_gaussian=cap_dup,
                         heavy_rows_cap=None),
        # segsum off (scatter-add grads), split table on
        "no_segsum": dict(max_tiles_per_gaussian=cap_dup,
                          heavy_rows_cap=cap_heavy,
                          segsum_grad_reduce=False),
        # round-2 equivalent: full-width table, scatter grads, mtpg=32
        "r2_equiv": dict(max_tiles_per_gaussian=32, heavy_rows_cap=None,
                         segsum_grad_reduce=False),
        # probed mtpg only (no heavy, no segsum)
        "dup_only": dict(max_tiles_per_gaussian=cap_dup,
                         heavy_rows_cap=None, segsum_grad_reduce=False),
    }
    import sys
    for tag in (sys.argv[1:] or list(configs)):
        timed(dataclasses.replace(base, **common, **configs[tag]), tag)


if __name__ == "__main__":
    main()
