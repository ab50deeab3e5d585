"""Camera/projection matrices and homogeneous transforms (pure jnp).

Matrix conventions follow the reference (INRIA 3DGS / DAS3R) exactly:
  * ``world_to_view(R, t)`` builds the COLMAP-style W2V with R stored
    transposed (reference utils/graphics_utils.py:47-58).
  * ``projection_matrix`` is the OpenGL-style matrix with z mapped to [0, 1]
    and z_sign=+1 (reference utils/graphics_utils.py:80-100).
  * The rasterizer consumes these matrices in ROW-VECTOR form — i.e. the
    transpose of the above, applied as ``p' = [x y z 1] @ M`` — because the
    reference transposes before handing them to CUDA
    (scene/cameras.py:90-93, gaussian_renderer/__init__.py:56-78).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate=np.zeros(3), scale: float = 1.0) -> np.ndarray:
    """COLMAP (R, t) -> 4x4 world-to-view float32 (getWorld2View2)."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    c2w = np.linalg.inv(Rt)
    center = (c2w[:3, 3] + translate) * scale
    c2w[:3, 3] = center
    return np.float32(np.linalg.inv(c2w))


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float,
                      dtype=jnp.float32) -> jax.Array:
    """OpenGL-style perspective matrix with z in [0,1], z_sign=+1
    (reference utils/graphics_utils.py:80-100). Column-vector form."""
    tan_y = math.tan(fovy / 2)
    tan_x = math.tan(fovx / 2)
    top = tan_y * znear
    right = tan_x * znear
    P = np.zeros((4, 4))
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return jnp.asarray(P, dtype)


def projection_matrix_dyn(znear, zfar, fovx, fovy):
    """Traced-FoV version of ``projection_matrix`` (jnp ops) — used by the
    learnable-FoV render path (reference render_no_soft,
    gaussian_renderer/__init__.py:308-318)."""
    fovx = jnp.asarray(fovx)
    fovy = jnp.asarray(fovy)
    inv_tan_x = 1.0 / jnp.tan(fovx / 2)
    inv_tan_y = 1.0 / jnp.tan(fovy / 2)
    z = jnp.zeros(())
    o = jnp.ones(())
    c = jnp.full((), zfar / (zfar - znear))
    d = jnp.full((), -(zfar * znear) / (zfar - znear))
    return jnp.stack([
        jnp.stack([inv_tan_x, z, z, z]),
        jnp.stack([z, inv_tan_y, z, z]),
        jnp.stack([z, z, c, d]),
        jnp.stack([z, z, o, z]),
    ])


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal, pixels):
    """Works on python floats or jnp arrays (learnable-FoV path)."""
    if isinstance(focal, (jax.Array, jnp.ndarray)):
        return 2 * jnp.arctan(pixels / (2 * focal))
    return 2 * math.atan(pixels / (2 * focal))


def geotrf(T: jax.Array, pts: jax.Array, ncol: int | None = None) -> jax.Array:
    """Apply (..., 4, 4) (or 3x4 / 3x3) transform(s) to (..., N, 3) points.

    Equivalent of the reference's ``geotrf`` (dynamic_predictor/dust3r/utils/
    geometry.py:40) restricted to the affine cases the pipeline uses.
    """
    d = pts.shape[-1]
    R = T[..., :d, :d]
    out = jnp.einsum("...ij,...nj->...ni", R, pts)
    if T.shape[-1] > d:
        out = out + T[..., :d, d][..., None, :]
    if ncol is not None:
        out = out[..., :ncol]
    return out


def homogenize(pts: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 4) with trailing ones."""
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], -1)
