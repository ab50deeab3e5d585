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


def check_parity(results):
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
            results.append({"check": "parity_window", "tight": tight,
                            "dma": dma, "maxdiff": d, "ok": line_ok})
            print(f"parity tight={tight} dma={dma}: maxdiff={d:.2e} "
                  f"overflow={int(aux.tile_overflow)} "
                  f"{'OK' if line_ok else 'FAIL'}", flush=True)
    return ok


def check_parity_entry_stream(results):
    """Entry-stream path (the production TPU path) vs the f64 oracle —
    normal scene + a dense 0.9-opacity scene exercising the saturation
    skip — and gradient parity vs the [T, K] window path."""
    import functools
    import jax
    import jax.numpy as jnp
    import numpy as np
    from das3r_tpu.ops.splat import RasterSettings, rasterize
    from das3r_tpu.ops.splat.reference import rasterize_reference
    from tests.test_splat import make_camera, make_scene

    ok = True
    for name, seed, dense in (("normal", 42, False), ("dense", 17, True)):
        rng = np.random.default_rng(seed)
        s = RasterSettings(image_height=128, image_width=128, sh_degree=0,
                           max_per_tile=2048, max_tiles_per_gaussian=64,
                           max_total_entries=200_000, entry_stream=True)
        means, scales, rots, ops, colors = make_scene(
            1200, rng, spread=0.6 if dense else 1.5)
        if dense:
            ops = rng.uniform(0.9, 0.98, 1200).astype(np.float32)
            scales = (scales * 3.0).astype(np.float32)
        view, proj, campos, tfx, tfy = make_camera(s)
        bg = np.array([0.2, 0.3, 0.1], np.float32)
        kw = dict(viewmatrix=jnp.asarray(view), projmatrix=jnp.asarray(proj),
                  campos=jnp.asarray(campos), bg=jnp.asarray(bg),
                  tan_fovx=tfx, tan_fovy=tfy, scales=jnp.asarray(scales),
                  rotations=jnp.asarray(rots),
                  colors_precomp=jnp.asarray(colors))
        img, _, _ = jax.jit(functools.partial(
            rasterize, settings=s, backend="pallas"))(
            jnp.asarray(means), jnp.asarray(ops), **kw)
        ref_img, _ = rasterize_reference(
            means, ops, s, viewmatrix=view, projmatrix=proj, campos=campos,
            bg=bg, tan_fovx=tfx, tan_fovy=tfy, scales=scales,
            rotations=rots, colors_precomp=colors)
        d = float(np.abs(np.asarray(img) - ref_img).max())
        line_ok = d < 5e-4
        ok &= line_ok
        results.append({"check": "parity_entry_stream", "scene": name,
                        "maxdiff": d, "ok": line_ok})
        print(f"parity entry_stream scene={name}: maxdiff={d:.2e} "
              f"{'OK' if line_ok else 'FAIL'}", flush=True)

        def gradfn(st):
            def f(m, o):
                i, _, _ = rasterize(m, o, st, backend="pallas", **kw)
                w = jnp.cos(jnp.arange(i.size).reshape(i.shape) * 0.01)
                return jnp.sum(i * w)
            return jax.jit(jax.grad(f, argnums=(0, 1)))(
                jnp.asarray(means), jnp.asarray(ops))

        g_es = gradfn(s)
        g_w = gradfn(dataclasses.replace(s, entry_stream=False))
        rel = max(float(jnp.abs(a - b).max()
                        / (jnp.abs(b).max() + 1e-12))
                  for a, b in zip(g_es, g_w))
        g_ok = rel < 1e-4
        ok &= g_ok
        results.append({"check": "grad_entry_vs_window", "scene": name,
                        "max_rel": rel, "ok": g_ok})
        print(f"grads entry-vs-window scene={name}: max_rel={rel:.2e} "
              f"{'OK' if g_ok else 'FAIL'}", flush=True)
    return ok


def run_stages(stages):
    import subprocess
    subprocess.run([sys.executable, "-u",
                    os.path.join(os.path.dirname(__file__),
                                 "bench_raster_stages.py"),
                    "--iters", "30", "--stages", stages], check=False)


def run_ab(results=None):
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
        if results is not None:
            results.append({"check": "ab_dma", "dma": dma,
                            "ms_per_iter": round(ms, 2)})
        print(f"ab use_dma_windows={dma}: {ms:.2f} ms/iter "
              f"({H * W * ITERS / best / 1e6:.2f} Mpix/s)", flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--skip", default="", help="comma list of sections")
    ap.add_argument("--stages",
                    default="prep,prep_bin,prep_bin_gather,full_fwd,"
                            "full_fwd_bwd")
    ap.add_argument("--json", default=None,
                    help="write the structured result list here")
    args = ap.parse_args(argv)
    skip = set(args.skip.split(",")) if args.skip else set()

    ok = True
    results = []
    if "parity" not in skip:
        ok &= check_parity(results)
    if "entry" not in skip:
        ok &= check_parity_entry_stream(results)
    if "stages" not in skip:
        run_stages(args.stages)
    if "ab" not in skip:
        run_ab(results)
    if "bench" not in skip:
        import subprocess
        subprocess.run([sys.executable, "-u", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench.py")], check=False)
    if args.json:
        import json
        with open(args.json, "w") as f:
            json.dump({"ok": ok, "results": results}, f, indent=1)
        print(f"wrote {args.json}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
