"""Headless panel renderer behind the GUI (reference train_gui.py GUI
class :57-465): orbit-view RGB, staticness (confidence) maps, GT
dynamic-mask blends, and a top-down trajectory plot, each as uint8
numpy images ready for PNG/browser streaming.

The reference mutates dearpygui textures from inside the train loop
(`test_step` :631-639); here the renderer is a pure function of
(scene arrays, orbit camera), so the same class serves the HTTP viewer,
notebook use, and offline dashboards.
"""
from __future__ import annotations

import dataclasses
import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

from das3r_tpu.models import render as render_mod
from das3r_tpu.ops.splat import RasterSettings
from das3r_tpu.utils.camera_paths import OrbitCamera
from das3r_tpu.utils.quat import w2c_to_pose
from das3r_tpu.eval.viz import colormap_jet

PANEL_MODES = ("rgb", "confidence", "no_soft")


@dataclasses.dataclass
class ViewerScene:
    """Render-ready scene state + jitted per-mode renderers."""

    params: object               # GaussianParams
    meta: object                 # GaussianMeta
    settings: RasterSettings
    conf: object | None = None   # per-Gaussian conf (PLY-loaded); None ->
                                 # conf_static gather (training-time state)
    bg: object = None            # [3]
    train_poses7: np.ndarray | None = None   # [F, 7] for the trajectory plot
    gt_poses_c2w: np.ndarray | None = None   # optional GT for the plot
    backend: str = "auto"

    def __post_init__(self):
        if self.bg is None:
            self.bg = jnp.zeros(3, jnp.float32)
        self._render = {}

    # -- orbit helpers ---------------------------------------------------
    def default_orbit(self, width: int | None = None,
                      height: int | None = None,
                      fovy_deg: float = 60.0) -> OrbitCamera:
        """Orbit around the alive centroid at ~1.5x the scene radius."""
        alive = np.asarray(self.meta.alive)
        xyz = np.asarray(self.params.xyz)[alive]
        center = xyz.mean(axis=0) if xyz.size else np.zeros(3)
        if xyz.size:
            radius = 1.5 * float(np.percentile(
                np.linalg.norm(xyz - center, axis=1), 90))
        else:
            radius = 2.0
        cam = OrbitCamera(width or self.settings.image_width,
                          height or self.settings.image_height,
                          radius=max(radius, 1e-2), fovy_deg=fovy_deg)
        cam.center = center
        return cam

    def _renderer(self, mode: str):
        if mode not in self._render:
            rmode = {"rgb": "test" if self.conf is not None else "train",
                     "confidence": "confidence",
                     "no_soft": "no_soft"}[mode]

            @functools.partial(jax.jit, static_argnames=())
            def run(params, meta, conf, pose7, fovx, fovy):
                out = render_mod.render(
                    params, meta, self.settings, pose7, self.bg,
                    fovx, fovy, mode=rmode, conf_per_gaussian=conf,
                    backend=self.backend)
                return out.image

            self._render[mode] = run
        return self._render[mode]

    # -- panels ----------------------------------------------------------
    def render_panel(self, orbit: OrbitCamera, mode: str = "rgb"
                     ) -> np.ndarray:
        """One orbit view -> [H, W, 3] uint8 (PANEL_MODES)."""
        if mode not in PANEL_MODES:
            raise ValueError(f"mode {mode!r} not in {PANEL_MODES}")
        c2w = orbit.pose
        w2c = np.linalg.inv(c2w).astype(np.float32)
        pose7 = w2c_to_pose(jnp.asarray(w2c))
        fovy = jnp.asarray(orbit.fovy, jnp.float32)
        fovx = jnp.asarray(
            2 * np.arctan(np.tan(orbit.fovy / 2) * orbit.W / orbit.H),
            jnp.float32)
        img = self._renderer(mode)(self.params, self.meta, self.conf,
                                   pose7, fovx, fovy)
        arr = np.clip(np.asarray(img).transpose(1, 2, 0), 0.0, 1.0)
        if mode == "confidence":
            return colormap_jet(arr[..., 0])
        return (arr * 255).astype(np.uint8)

    def mask_blend_panel(self, image01_hw3: np.ndarray,
                         mask_hw: np.ndarray,
                         color=(1.0, 0.1, 0.1), alpha: float = 0.5
                         ) -> np.ndarray:
        """GT/pred dynamic-mask overlay (train_gui.py mask blend views):
        image blended toward ``color`` where mask > 0.5."""
        img = np.clip(np.asarray(image01_hw3, np.float64), 0, 1)
        m = (np.asarray(mask_hw) > 0.5)[..., None]
        out = np.where(m, (1 - alpha) * img + alpha * np.asarray(color),
                       img)
        return (out * 255).astype(np.uint8)

    def trajectory_panel(self, size: int = 360) -> np.ndarray:
        """Top-down (x, z) trajectory plot of the train poses (and GT if
        present) — the GUI's ATE plot role, drawn dependency-free."""
        img = np.full((size, size, 3), 24, np.uint8)
        trajs = []
        if self.train_poses7 is not None and len(self.train_poses7):
            c2w = _pose7_to_centers(np.asarray(self.train_poses7))
            trajs.append((c2w, np.asarray([90, 200, 255])))
        if self.gt_poses_c2w is not None and len(self.gt_poses_c2w):
            trajs.append((np.asarray(self.gt_poses_c2w)[:, :3, 3],
                          np.asarray([120, 255, 120])))
        if not trajs:
            return img
        allpts = np.concatenate([t[0] for t in trajs])[:, [0, 2]]
        lo = allpts.min(axis=0)
        span = max(float((allpts.max(axis=0) - lo).max()), 1e-9)
        margin = 0.1 * size
        scale = (size - 2 * margin) / span
        for centers, color in trajs:
            pix = ((centers[:, [0, 2]] - lo) * scale + margin)
            pix = np.clip(pix, 0, size - 1).astype(int)
            for a, b in zip(pix[:-1], pix[1:]):
                _draw_line(img, a, b, color)
            for p in pix:
                img[max(p[1] - 1, 0): p[1] + 2,
                    max(p[0] - 1, 0): p[0] + 2] = color
        return img

    # -- constructors ----------------------------------------------------
    @classmethod
    def from_model_dir(cls, model_path: str, iteration: int,
                       sh_degree: int = 3, max_per_tile: int = 1024,
                       resolution=(480, 320), backend: str = "auto"):
        """Load a trained checkpoint directory (render_tool layout:
        point_cloud/iteration_N/point_cloud.ply + pose/pose_N.npy)."""
        from das3r_tpu.eval.render_tool import load_gaussians_ply
        from das3r_tpu.models import autosize

        ply_path = os.path.join(model_path, "point_cloud",
                                f"iteration_{iteration}", "point_cloud.ply")
        params, meta, conf = load_gaussians_ply(ply_path, sh_degree)
        pose_path = os.path.join(model_path, "pose",
                                 f"pose_{iteration}.npy")
        train_poses7 = None
        if os.path.exists(pose_path):
            w2c = np.load(pose_path)
            train_poses7 = np.asarray(
                w2c_to_pose(jnp.asarray(w2c, jnp.float32)))
        w, h = resolution
        settings = RasterSettings(
            image_height=h, image_width=w, sh_degree=sh_degree,
            max_per_tile=max_per_tile, max_tiles_per_gaussian=32,
            max_total_entries=8 * params.xyz.shape[0])
        scene = cls(params=params, meta=meta, settings=settings, conf=conf,
                    train_poses7=train_poses7, backend=backend)
        # probe entry capacity from a few orbit views around the scene
        orbit = scene.default_orbit()
        probe_poses = []
        for yaw in np.linspace(0, 2 * np.pi, 4, endpoint=False):
            orbit.yaw = float(yaw)
            w2c = np.linalg.inv(orbit.pose).astype(np.float32)
            probe_poses.append(np.asarray(w2c_to_pose(jnp.asarray(w2c))))
        fovy = jnp.asarray(orbit.fovy, jnp.float32)
        fovx = jnp.asarray(
            2 * np.arctan(np.tan(orbit.fovy / 2) * w / h), jnp.float32)
        cap = autosize.auto_entry_cap(
            params, meta, settings, np.stack(probe_poses), fovx, fovy,
            margin=1.5, mode="no_soft")
        scene.settings = dataclasses.replace(settings,
                                             max_total_entries=cap)
        return scene


def _pose7_to_centers(pose7: np.ndarray) -> np.ndarray:
    """[F, 7] w2c (quat, t) -> camera centers in world frame."""
    from das3r_tpu.utils.quat import pose_to_w2c
    w2c = np.asarray(jax.vmap(pose_to_w2c)(jnp.asarray(pose7, jnp.float32)))
    c2w = np.linalg.inv(w2c)
    return c2w[:, :3, 3]


def _draw_line(img: np.ndarray, a, b, color) -> None:
    n = int(max(abs(b[0] - a[0]), abs(b[1] - a[1]), 1))
    xs = np.linspace(a[0], b[0], n + 1).astype(int)
    ys = np.linspace(a[1], b[1], n + 1).astype(int)
    img[ys, xs] = color
