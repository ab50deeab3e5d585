"""Differentiable quaternion / rigid-transform math (pure jnp).

Conventions (kept bit-compatible with the reference so pose gradients match):
  * quaternions are (w, x, y, z), NOT normalized in storage; every consumer
    normalizes first (reference: utils/pose_utils.py:37-55).
  * a camera pose tensor is ``[qw qx qy qz tx ty tz]`` and maps world->camera
    as ``X_cam = R(q) @ X_world + t`` (reference: utils/pose_utils.py:57-84,
    where w2c[:3,:3] = quad2rotation(q), w2c[:3,3] = t).

All functions are stateless, fully jit/vmap-able, and operate on arbitrary
leading batch dims unless noted.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def quat_normalize(q: jax.Array) -> jax.Array:
    """Normalize quaternion(s) along the last axis."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation.

    Normalize-then-expand, matching utils/pose_utils.py:37-55 exactly so the
    gradient through unnormalized quaternion parameters is identical.
    """
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1)
    row1 = jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1)
    row2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], -2)


def quat_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product of wxyz quaternions (broadcasts over leading dims).

    Matches utils/pose_utils.py:86-104 (``quadmultiply``): used to rotate
    per-Gaussian orientation quats into the camera frame.
    """
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        -1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v (..., 3) by quaternion(s) q (..., 4)."""
    return jnp.einsum("...ij,...j->...i", quat_to_rotmat(q), v)


def _sqrt_positive_part(x: jax.Array) -> jax.Array:
    """sqrt(max(0, x)) with zero subgradient at 0 (pytorch3d convention,
    reference utils/pose_utils.py:106-115)."""
    safe = jnp.where(x > 0, x, 1.0)
    return jnp.where(x > 0, jnp.sqrt(safe), 0.0)


def rotmat_to_quat(m: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation -> (..., 4) wxyz quaternion.

    Branch-robust 4-candidate selection (pytorch3d ``matrix_to_quaternion``;
    reference utils/pose_utils.py:117-180) implemented with one-hot gather so
    it stays jit-able.
    """
    batch = m.shape[:-2]
    f = m.reshape(batch + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(f, -1, 0)

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            -1,
        )
    )

    cand = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], -1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], -1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], -1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], -1),
        ],
        -2,
    )
    cand = cand / (2.0 * jnp.maximum(q_abs[..., None], 0.1))
    best = jnp.argmax(q_abs, axis=-1)
    onehot = jax.nn.one_hot(best, 4, dtype=m.dtype)
    return jnp.einsum("...c,...cq->...q", onehot, cand)


def pose_to_w2c(pose: jax.Array) -> jax.Array:
    """[... , 7] (wxyz quat + t) -> (..., 4, 4) world-to-camera matrix.

    Matches ``get_camera_from_tensor`` (utils/pose_utils.py:57-84). Fully
    differentiable w.r.t. the pose tensor — this is the path through which
    the photometric loss reaches the learnable camera parameters.
    """
    q, t = pose[..., :4], pose[..., 4:7]
    r = quat_to_rotmat(q)
    top = jnp.concatenate([r, t[..., :, None]], -1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], pose.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], -2)


def w2c_to_pose(w2c: jax.Array) -> jax.Array:
    """(..., 4, 4) -> [..., 7] quat+t (``get_tensor_from_camera``,
    utils/pose_utils.py:183-215)."""
    q = rotmat_to_quat(w2c[..., :3, :3])
    return jnp.concatenate([q, w2c[..., :3, 3]], -1)


def se3_inverse(m: jax.Array) -> jax.Array:
    """Invert (..., 4, 4) rigid transform(s) without a linear solve."""
    r = m[..., :3, :3]
    t = m[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    new_t = -jnp.einsum("...ij,...j->...i", rt, t)
    top = jnp.concatenate([rt, new_t[..., :, None]], -1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], m.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], -2)
