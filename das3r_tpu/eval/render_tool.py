"""Offline rendering tool — the ``render.py`` equivalent: load a trained
scene (PLY + optimized poses), re-render every training view with the
conf-modulated test renderer, optionally encode an mp4 at fps 15
(reference render.py:31-123; interpolation disabled upstream — training
poses are used verbatim, render.py:35-42).
"""
from __future__ import annotations

import dataclasses
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from das3r_tpu.data import ply as ply_io
from das3r_tpu.data import readers
from das3r_tpu.models import render as render_mod
from das3r_tpu.models.gaussians import GaussianMeta, GaussianParams
from das3r_tpu.ops.splat import RasterSettings
from das3r_tpu.utils.quat import w2c_to_pose


def load_gaussians_ply(path: str, max_sh_degree: int = 3):
    """PLY checkpoint -> (GaussianParams, GaussianMeta, conf_per_gaussian).

    Matches load_ply semantics (gaussian_model.py:371-418): the raw
    ``opacity_ori`` logit is restored and conf_static is applied at render
    time (render_test, gaussian_renderer/__init__.py:224-226)."""
    d = ply_io.read_gaussians(path, max_sh_degree)
    n = d["xyz"].shape[0]
    params = GaussianParams(
        xyz=jnp.asarray(d["xyz"], jnp.float32),
        features_dc=jnp.asarray(d["f_dc"], jnp.float32),
        features_rest=jnp.asarray(d["f_rest"], jnp.float32),
        scaling=jnp.asarray(d["scaling"], jnp.float32),
        rotation=jnp.asarray(d["rotation"], jnp.float32),
        opacity=jnp.asarray(d["opacity_logit"], jnp.float32),
        conf_static=jnp.zeros((1, 1, 1), jnp.float32))  # not used in test
    meta = GaussianMeta(
        alive=jnp.ones(n, bool),
        pix_id=jnp.zeros(n, jnp.int32),
        max_radii2d=jnp.zeros(n), xyz_grad_accum=jnp.zeros(n),
        denom=jnp.zeros(n))
    return params, meta, jnp.asarray(d["conf_static"], jnp.float32)


def images_to_video(image_paths, out_path: str, fps: int = 15) -> str:
    """Encode frames to video. Prefers mp4 (imageio-ffmpeg or a system
    ffmpeg); falls back to an animated GIF when no encoder exists (this
    image ships neither ffmpeg nor imageio[ffmpeg]). Returns the path
    actually written."""
    import shutil
    import subprocess

    try:
        import imageio.v2 as imageio
        frames = [imageio.imread(p) for p in image_paths]
        imageio.mimwrite(out_path, frames, fps=fps)
        return out_path
    except Exception:
        pass
    if shutil.which("ffmpeg"):
        list_file = out_path + ".frames.txt"
        with open(list_file, "w") as f:
            for p in image_paths:
                f.write(f"file '{os.path.abspath(p)}'\n")
        subprocess.run(
            ["ffmpeg", "-y", "-r", str(fps), "-f", "concat", "-safe", "0",
             "-i", list_file, "-pix_fmt", "yuv420p", out_path], check=True)
        os.remove(list_file)
        return out_path
    gif_path = os.path.splitext(out_path)[0] + ".gif"
    imgs = [Image.open(p) for p in image_paths]
    imgs[0].save(gif_path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
    print(f"no mp4 encoder available; wrote {gif_path} instead")
    return gif_path


def render_sets(source_path: str, model_path: str, iteration: int,
                *, get_video: bool = False, fps: int = 15,
                mode: str = "test", max_per_tile: int = 1024,
                sh_degree: int = 3, white_background: bool = False):
    """Render all train views at checkpoint ``iteration``."""
    data = readers.load_scene(source_path, eval_mode=False)
    ply_path = os.path.join(model_path, "point_cloud",
                            f"iteration_{iteration}", "point_cloud.ply")
    params, meta, conf = load_gaussians_ply(ply_path, sh_degree)
    poses_w2c = np.load(os.path.join(model_path, "pose",
                                     f"pose_{iteration}.npy"))
    pose7 = np.asarray(w2c_to_pose(jnp.asarray(poses_w2c, jnp.float32)))

    settings = RasterSettings(
        image_height=data.height, image_width=data.width,
        sh_degree=sh_degree, max_per_tile=max_per_tile,
        max_tiles_per_gaussian=32)
    from das3r_tpu.models import autosize
    settings = dataclasses.replace(
        settings, max_total_entries=autosize.auto_entry_cap(
            params, meta, settings, pose7,
            jnp.asarray(data.fovx[0]), jnp.asarray(data.fovy[0]),
            margin=1.1, mode=mode if mode != "test" else "no_soft"))
    bg = jnp.ones(3) if white_background else jnp.zeros(3)

    out_dir = Path(model_path) / f"renders_{iteration}"
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = []
    render_jit = jax.jit(
        lambda p, m, pose, fx, fy, c: render_mod.render(
            p, m, settings, pose, bg, fx, fy, mode=mode,
            conf_per_gaussian=c).image)
    for f in range(min(len(pose7), data.n_frames)):
        img = render_jit(params, meta, jnp.asarray(pose7[f]),
                         jnp.asarray(data.fovx[f]),
                         jnp.asarray(data.fovy[f]), conf)
        arr = np.clip(np.asarray(img).transpose(1, 2, 0), 0, 1)
        p = out_dir / f"{f:05d}.png"
        Image.fromarray((arr * 255).astype(np.uint8)).save(p)
        paths.append(str(p))
    if get_video:
        images_to_video(paths, str(out_dir / "render.mp4"), fps=fps)
    return str(out_dir), paths


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-s", "--source_path", required=True)
    ap.add_argument("-m", "--model_path", required=True)
    ap.add_argument("--iteration", type=int, required=True)
    ap.add_argument("--get_video", action="store_true")
    ap.add_argument("--fps", type=int, default=15)
    ap.add_argument("--mode", default="test",
                    choices=["test", "no_soft", "confidence"])
    args = ap.parse_args(argv)
    out_dir, paths = render_sets(args.source_path, args.model_path,
                                 args.iteration, get_video=args.get_video,
                                 fps=args.fps, mode=args.mode)
    print(f"rendered {len(paths)} views -> {out_dir}")


if __name__ == "__main__":
    main()
