"""Depth <-> pointmap geometry (pure jnp).

TPU-native equivalents of the reference helpers used by both stages:
``xy_grid`` / ``depthmap_to_pts3d`` (dynamic_predictor/dust3r/utils/
geometry.py:15,114-226) and ``depth_to_pts3d`` used for Gaussian init
(utils/pose_utils.py:572-683).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def xy_grid(w: int, h: int, dtype=jnp.float32) -> jax.Array:
    """(H, W, 2) grid of pixel coordinates (x, y), matching ``np.meshgrid``
    xy-indexing in the reference."""
    x = jnp.arange(w, dtype=dtype)
    y = jnp.arange(h, dtype=dtype)
    gx, gy = jnp.meshgrid(x, y, indexing="xy")
    return jnp.stack([gx, gy], -1)


def depthmap_to_camera_coords(depth: jax.Array, K: jax.Array) -> jax.Array:
    """Unproject (H, W) depth with 3x3 intrinsics K -> (H, W, 3) camera-frame
    points (z = depth). Assumes zero skew (reference geometry.py:165-199)."""
    h, w = depth.shape
    grid = xy_grid(w, h, depth.dtype)
    fu, fv = K[0, 0], K[1, 1]
    cu, cv = K[0, 2], K[1, 2]
    x = depth * (grid[..., 0] - cu) / fu
    y = depth * (grid[..., 1] - cv) / fv
    return jnp.stack([x, y, depth], -1)


def depthmap_to_pts3d(depth: jax.Array, K: jax.Array,
                      c2w: jax.Array | None = None) -> jax.Array:
    """Depth (..., H, W) + intrinsics (..., 3, 3) [+ cam2world (..., 4, 4)]
    -> world-frame pointmap (..., H, W, 3)."""
    fn = depthmap_to_camera_coords
    for _ in range(depth.ndim - 2):
        fn = jax.vmap(fn)
    pts_cam = fn(depth, K)
    if c2w is None:
        return pts_cam
    R = c2w[..., :3, :3]
    t = c2w[..., :3, 3]
    return jnp.einsum("...ij,...hwj->...hwi", R, pts_cam) + t[..., None, None, :]


def pts3d_to_depthmap(pts_cam: jax.Array) -> jax.Array:
    return pts_cam[..., 2]


def project_points(pts_cam: jax.Array, K: jax.Array,
                   eps: float = 1e-8) -> jax.Array:
    """Camera-frame points (..., 3) -> pixel coords (..., 2)."""
    z = pts_cam[..., 2:3]
    uv = pts_cam[..., :2] / jnp.where(jnp.abs(z) < eps, eps, z)
    fu, fv = K[..., 0, 0], K[..., 1, 1]
    cu, cv = K[..., 0, 2], K[..., 1, 2]
    u = uv[..., 0] * fu + cu
    v = uv[..., 1] * fv + cv
    return jnp.stack([u, v], -1)


def intrinsics_matrix(focal, pp, dtype=jnp.float32) -> jax.Array:
    """Build (..., 3, 3) K from focal (scalar or (...,)) and pp (..., 2)."""
    focal = jnp.asarray(focal, dtype)
    pp = jnp.asarray(pp, dtype)
    z = jnp.zeros_like(focal)
    o = jnp.ones_like(focal)
    row0 = jnp.stack([focal, z, pp[..., 0]], -1)
    row1 = jnp.stack([z, focal, pp[..., 1]], -1)
    row2 = jnp.stack([z, z, o], -1)
    return jnp.stack([row0, row1, row2], -2)


def normalize_pointcloud_avg_dis(pts: jax.Array, valid: jax.Array,
                                 eps: float = 1e-8):
    """Scale pointmaps so the average distance-to-origin over valid pixels is
    1 (reference geometry.py:253 'avg_dis' mode). Returns (pts/s, s)."""
    dis = jnp.linalg.norm(pts, axis=-1)
    w = valid.astype(pts.dtype)
    s = (dis * w).sum() / w.sum().clip(1.0)
    s = jnp.maximum(s, eps)
    return pts / s, s
