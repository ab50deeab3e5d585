"""Gaussian scene state — the TPU-native equivalent of the reference's
``GaussianModel`` (scene/gaussian_model.py:29-659), re-designed as immutable
pytrees + pure functions instead of a mutable parameter store:

  * ``GaussianParams``   — the main Adam group (gaussian attrs + the learnable
    per-frame per-pixel static-confidence map ``conf_static``,
    reference :52-57, :233-243, :659);
  * ``PoseParams``       — the camera Adam group: per-frame quaternion /
    translation stacks Q, T plus learnable FoV (reference :149-166, :246-255);
  * ``TestPoseParams``   — held-out test-frame poses (reference :132-147);
  * ``GaussianMeta``     — non-learnable bookkeeping: capacity alive-mask,
    per-Gaussian source-pixel ids (the ``aggregated_mask`` contract,
    reference :624-629), and densification statistics.

Capacity padding: arrays are allocated at a fixed capacity with an ``alive``
mask so densify/prune never changes shapes under jit (SURVEY.md §7 step 4,
hard-part 3). Dead slots carry opacity 0 and are skipped by binning at zero
cost (see ops/splat/preprocess.Preprocessed.binnable).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from das3r_tpu.ops.knn import knn_mean_sq_dist
from das3r_tpu.utils import sh as sh_lib
from das3r_tpu.utils.image import inverse_sigmoid
from das3r_tpu.utils.quat import w2c_to_pose


class GaussianParams(NamedTuple):
    """Learnable Gaussian attributes, capacity-padded to [Nc, ...]."""
    xyz: jax.Array            # [Nc, 3]
    features_dc: jax.Array    # [Nc, 1, 3]
    features_rest: jax.Array  # [Nc, K-1, 3]
    scaling: jax.Array        # [Nc, 3] log-scale
    rotation: jax.Array       # [Nc, 4] wxyz (unnormalized storage)
    opacity: jax.Array        # [Nc, 1] logit
    conf_static: jax.Array    # [F, H, W] learnable staticness per pixel


class PoseParams(NamedTuple):
    """Per-frame learnable camera parameters (the separate Adam group)."""
    Q: jax.Array    # [F, 4]
    T: jax.Array    # [F, 3]
    fovx: jax.Array  # []
    fovy: jax.Array  # []

    def pose(self, uid) -> jax.Array:
        """[7] wxyz+t pose tensor for frame ``uid`` (get_RT, reference :170)."""
        return jnp.concatenate([self.Q[uid], self.T[uid]])

    def all_poses(self) -> jax.Array:
        return jnp.concatenate([self.Q, self.T], -1)


class TestPoseParams(NamedTuple):
    Q: jax.Array
    T: jax.Array

    def pose(self, uid) -> jax.Array:
        return jnp.concatenate([self.Q[uid], self.T[uid]])


class GaussianMeta(NamedTuple):
    """Non-learnable per-Gaussian state (same capacity Nc)."""
    alive: jax.Array            # [Nc] bool
    pix_id: jax.Array           # [Nc] int32 flat (frame*H*W + pixel) source id
    max_radii2d: jax.Array      # [Nc] float
    xyz_grad_accum: jax.Array   # [Nc] float
    denom: jax.Array            # [Nc] float


@dataclasses.dataclass(frozen=True)
class GaussianScene:
    """Static scene description shared by train/render code."""
    max_sh_degree: int
    n_frames: int
    height: int
    width: int
    capacity: int
    spatial_lr_scale: float = 1.0


def activated_scaling(params: GaussianParams) -> jax.Array:
    return jnp.exp(params.scaling)


def activated_opacity(params: GaussianParams) -> jax.Array:
    return jax.nn.sigmoid(params.opacity)


def per_gaussian_conf(params: GaussianParams, meta: GaussianMeta) -> jax.Array:
    """Gather the learnable per-pixel staticness onto each Gaussian — the
    functional form of ``_conf_static.reshape(-1,1)[aggregated_mask]``
    (reference gaussian_renderer/__init__.py:95-97). Differentiable: the
    backward is a scatter-add into ``conf_static``."""
    flat = params.conf_static.reshape(-1)
    return flat[meta.pix_id]


def num_rest_coeffs(max_sh_degree: int) -> int:
    return (max_sh_degree + 1) ** 2 - 1


def _round_capacity(n: int, granularity: int = 4096) -> int:
    return max(granularity, -(-n // granularity) * granularity)


def init_from_frames(
    images: np.ndarray,        # [F, 3, H, W] in [0, 1]
    depths: np.ndarray,        # [F, H, W]
    confs: np.ndarray,         # [F, H, W] log-confidence from stage 1
    dyna_avg: np.ndarray,      # [F, H, W] dynamic-ness in [0, 1]
    poses_c2w: np.ndarray,     # [F, 4, 4]
    focals: np.ndarray,        # [F]
    max_sh_degree: int = 3,
    conf_thre: float = 1.0,
    capacity: int | None = None,
    spatial_lr_scale: float = 1.0,
    max_points: int | None = 1_500_000,
):
    """Host-side scene init — ``create_from_cameras`` (reference :573-659).

    Unprojects every frame's predicted depth with per-frame intrinsics and
    stage-1 poses, keeps pixels whose stage-1 confidence exceeds
    ``log(conf_thre)``, initializes per-Gaussian scales from the 3-NN mean
    distance and opacity to 1/n_frames. Returns
    (GaussianParams, GaussianMeta, PoseParams placeholderless scene statics).

    Dynamic-shaped selection happens here in numpy (one-shot, not hot); the
    result is padded to ``capacity`` for static-shape training.
    """
    F, _, H, W = images.shape
    pp = np.asarray([W / 2.0, H / 2.0], np.float32)  # reference uses W/2,H/2
                                                     # regardless of stored pp
                                                     # (gaussian_model.py:593)
    # unproject: pts_cam = [z * (pix - pp) / f, z]; world via c2w
    gx, gy = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    grid = np.stack([gx, gy], -1).astype(np.float32)          # [H, W, 2]
    pts_world = np.empty((F, H, W, 3), np.float32)
    for f in range(F):
        z = depths[f][..., None]
        xy = z * (grid - pp) / focals[f]
        cam = np.concatenate([xy, z], -1)
        R, t = poses_c2w[f, :3, :3], poses_c2w[f, :3, 3]
        pts_world[f] = cam @ R.T + t

    mask = confs.reshape(-1) > np.log(conf_thre)
    if max_points and int(mask.sum()) > max_points:
        # The reference unprojects EVERY passing pixel (dense init,
        # gaussian_model.py:624-629) — 50 frames at 512x288 is ~7M points,
        # beyond this chip's single-render budget. Keep the max_points
        # HIGHEST-CONFIDENCE pixels; disable with max_points=None/0.
        flat = confs.reshape(-1)
        thresh = np.partition(np.where(mask, flat, -np.inf),
                              -max_points)[-max_points]
        mask = mask & (flat >= thresh)
        # exact cap in case of threshold ties
        extra = int(mask.sum()) - max_points
        if extra > 0:
            ties = np.where(mask & (flat == thresh))[0]
            mask[ties[:extra]] = False
    pix_id = np.nonzero(mask)[0].astype(np.int32)
    n = pix_id.size
    pts = pts_world.reshape(-1, 3)[mask]
    colors = images.transpose(0, 2, 3, 1).reshape(-1, 3)[mask]

    cap = capacity or _round_capacity(n)
    assert cap >= n, f"capacity {cap} < live points {n}"

    dist2 = np.maximum(
        np.asarray(knn_mean_sq_dist(jnp.asarray(pts), k=3)), 1e-7)
    scales_live = np.log(np.sqrt(dist2))[:, None].repeat(3, 1)

    def pad(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, x.dtype)
        out[:n] = x
        return out

    n_rest = num_rest_coeffs(max_sh_degree)
    params = GaussianParams(
        xyz=jnp.asarray(pad(pts)),
        features_dc=jnp.asarray(
            pad(np.asarray(sh_lib.rgb_to_sh(colors))[:, None, :])),
        features_rest=jnp.zeros((cap, n_rest, 3), jnp.float32),
        scaling=jnp.asarray(pad(scales_live)),
        # identity quats EVERYWHERE incl. dead slots: a zero quaternion has
        # a NaN normalize-gradient that would poison the whole backward pass
        rotation=jnp.asarray(np.tile(
            np.asarray([1, 0, 0, 0], np.float32), (cap, 1))),
        opacity=jnp.asarray(pad(
            np.full((n, 1), _logit(1.0 / F), np.float32),
            fill=-1e4)),                       # dead slots: sigmoid -> 0
        conf_static=jnp.asarray(1.0 - dyna_avg.astype(np.float32)),
    )
    meta = GaussianMeta(
        alive=jnp.asarray(pad(np.ones(n, bool), fill=False)),
        pix_id=jnp.asarray(pad(pix_id)),       # dead slots point at pixel 0;
                                               # their opacity is 0 so the
                                               # gathered conf never matters
        max_radii2d=jnp.zeros(cap, jnp.float32),
        xyz_grad_accum=jnp.zeros(cap, jnp.float32),
        denom=jnp.zeros(cap, jnp.float32),
    )
    scene = GaussianScene(max_sh_degree=max_sh_degree, n_frames=F, height=H,
                          width=W, capacity=cap,
                          spatial_lr_scale=spatial_lr_scale)
    return params, meta, scene


def _logit(p: float) -> float:
    return float(np.log(p / (1 - p)))


def init_pose_params(poses_w2c: np.ndarray, fovx: float,
                     fovy: float) -> PoseParams:
    """Per-frame pose stacks from stage-1 world-to-camera matrices
    (init_RT_seq + init_fov, reference :149-166)."""
    pose7 = np.asarray(w2c_to_pose(jnp.asarray(poses_w2c, jnp.float32)))
    return PoseParams(
        Q=jnp.asarray(pose7[:, :4]),
        T=jnp.asarray(pose7[:, 4:]),
        fovx=jnp.asarray(fovx, jnp.float32),
        fovy=jnp.asarray(fovy, jnp.float32),
    )


def init_test_pose_params(poses_w2c: np.ndarray) -> TestPoseParams:
    pose7 = np.asarray(w2c_to_pose(jnp.asarray(poses_w2c, jnp.float32)))
    return TestPoseParams(Q=jnp.asarray(pose7[:, :4]),
                          T=jnp.asarray(pose7[:, 4:]))


def init_from_point_cloud(
    points: np.ndarray,           # [N, 3]
    colors: np.ndarray,           # [N, 3] in [0, 1]
    max_sh_degree: int = 3,
    capacity: int | None = None,
    spatial_lr_scale: float = 1.0,
    n_frames: int = 1,
    height: int = 1,
    width: int = 1,
):
    """Classic 3DGS init from a sparse point cloud (``create_from_pcd``,
    reference gaussian_model.py:203-226): SH-DC from colors, scales from
    3-NN mean distance, identity rotations, opacity 0.1. Used for
    COLMAP-points3D / Blender scenes without stage-1 side channels
    (conf_static starts at all-ones = fully static)."""
    n = points.shape[0]
    cap = capacity or _round_capacity(n)
    assert cap >= n

    dist2 = np.maximum(
        np.asarray(knn_mean_sq_dist(jnp.asarray(points, jnp.float32),
                                    k=3)), 1e-7)
    scales_live = np.log(np.sqrt(dist2))[:, None].repeat(3, 1)

    def pad(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return out

    n_rest = num_rest_coeffs(max_sh_degree)
    params = GaussianParams(
        xyz=jnp.asarray(pad(points.astype(np.float32))),
        features_dc=jnp.asarray(pad(
            np.asarray(sh_lib.rgb_to_sh(colors.astype(np.float32)))
            [:, None, :])),
        features_rest=jnp.zeros((cap, n_rest, 3), jnp.float32),
        scaling=jnp.asarray(pad(scales_live.astype(np.float32))),
        rotation=jnp.asarray(np.tile(
            np.asarray([1, 0, 0, 0], np.float32), (cap, 1))),
        opacity=jnp.asarray(pad(
            np.full((n, 1), _logit(0.1), np.float32), fill=-1e4)),
        conf_static=jnp.ones((n_frames, height, width), jnp.float32),
    )
    meta = GaussianMeta(
        alive=jnp.asarray(pad(np.ones(n, np.float32)) > 0),
        pix_id=jnp.zeros(cap, jnp.int32),
        max_radii2d=jnp.zeros(cap, jnp.float32),
        xyz_grad_accum=jnp.zeros(cap, jnp.float32),
        denom=jnp.zeros(cap, jnp.float32))
    scene = GaussianScene(max_sh_degree=max_sh_degree, n_frames=n_frames,
                          height=height, width=width, capacity=cap,
                          spatial_lr_scale=spatial_lr_scale)
    return params, meta, scene
