"""Scene visualization exports — the SceneViz/viz_demo role (reference
dynamic_predictor/dust3r/viz.py, utils/viz_demo.py) using PLY point clouds
(trimesh/glb is not available in this image) plus colormapped map dumps
(the reference's jet-colormap depth pngs, base_opt.py:411-425).
"""
from __future__ import annotations

import os

import numpy as np

from das3r_tpu.data import ply as ply_io


def export_scene_pointcloud(path: str, pts3d: np.ndarray,
                            colors01: np.ndarray,
                            conf: np.ndarray | None = None,
                            conf_thre: float = 0.0) -> int:
    """World-frame pointmaps [F, H, W, 3] + colors [F, H, W, 3] -> PLY.
    Optionally filter by confidence. Returns point count."""
    pts = pts3d.reshape(-1, 3)
    col = colors01.reshape(-1, 3)
    keep = np.isfinite(pts).all(-1)
    if conf is not None:
        keep &= conf.reshape(-1) > conf_thre
    pts = pts[keep]
    col = (np.clip(col[keep], 0, 1) * 255).astype(np.uint8)
    ply_io.write_point_cloud(path, pts.astype(np.float32), col)
    return int(pts.shape[0])


def export_camera_trajectory(path: str, poses_c2w: np.ndarray,
                             scale: float = 0.05) -> None:
    """Camera frusta as colored points: center (white), +z apex (red),
    rainbow ordering along the trajectory."""
    F = poses_c2w.shape[0]
    pts, cols = [], []
    for i, m in enumerate(poses_c2w):
        c = m[:3, 3]
        z = m[:3, 2]
        hue = i / max(F - 1, 1)
        base = np.asarray([255 * hue, 80, 255 * (1 - hue)])
        pts += [c, c + scale * z]
        cols += [base, [255, 0, 0]]
    ply_io.write_point_cloud(path, np.asarray(pts, np.float32),
                             np.asarray(cols, np.uint8))


def colormap_jet(x: np.ndarray) -> np.ndarray:
    """[H, W] scalars -> [H, W, 3] uint8 jet colormap (matplotlib-free to
    keep the hot path dependency-light; piecewise-linear jet)."""
    v = x.astype(np.float64)
    lo, hi = np.nanmin(v), np.nanmax(v)
    t = (v - lo) / max(hi - lo, 1e-12)
    r = np.clip(1.5 - np.abs(4 * t - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * t - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * t - 1), 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def save_depth_visualizations(out_dir: str, depths: np.ndarray) -> None:
    """Colormapped depth pngs + an animated gif (save_depth_maps,
    base_opt.py:411-425)."""
    from PIL import Image
    os.makedirs(out_dir, exist_ok=True)
    frames = []
    for i, d in enumerate(depths):
        img = Image.fromarray(colormap_jet(d))
        img.save(os.path.join(out_dir, f"depth_{i:04d}.png"))
        frames.append(img)
    if frames:
        frames[0].save(os.path.join(out_dir, "_depth_maps.gif"),
                       save_all=True, append_images=frames[1:],
                       duration=100, loop=0)
