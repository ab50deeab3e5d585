import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from das3r_tpu.utils import quat as Q


def rand_quat(rng, n):
    q = rng.standard_normal((n, 4))
    return q  # deliberately unnormalized; consumers normalize


def test_quat_to_rotmat_matches_scipy():
    rng = np.random.default_rng(0)
    q = rand_quat(rng, 64)
    R_ours = np.asarray(Q.quat_to_rotmat(jnp.asarray(q)))
    # scipy uses xyzw order
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    R_scipy = Rotation.from_quat(qn[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(R_ours, R_scipy, atol=1e-6)


def test_rotmat_roundtrip():
    rng = np.random.default_rng(1)
    q = rand_quat(rng, 128)
    R = Q.quat_to_rotmat(jnp.asarray(q))
    q2 = Q.rotmat_to_quat(R)
    R2 = Q.quat_to_rotmat(q2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)


def test_rotmat_to_quat_branch_robust():
    # exercise all four branch candidates: rotations near 0, pi about each axis
    mats = [np.eye(3)]
    for axis in np.eye(3):
        mats.append(Rotation.from_rotvec(np.pi * axis * 0.9999).as_matrix())
        mats.append(Rotation.from_rotvec(np.pi * axis).as_matrix())
    M = jnp.asarray(np.stack(mats))
    q = Q.rotmat_to_quat(M)
    R2 = Q.quat_to_rotmat(q)
    np.testing.assert_allclose(np.asarray(M), np.asarray(R2), atol=1e-5)


def test_quat_mul_matches_rotation_composition():
    rng = np.random.default_rng(2)
    q1, q2 = rand_quat(rng, 32), rand_quat(rng, 32)
    q1n = q1 / np.linalg.norm(q1, axis=-1, keepdims=True)
    q2n = q2 / np.linalg.norm(q2, axis=-1, keepdims=True)
    q12 = Q.quat_mul(jnp.asarray(q1n), jnp.asarray(q2n))
    R12 = np.asarray(Q.quat_to_rotmat(q12))
    R_expect = (Rotation.from_quat(q1n[:, [1, 2, 3, 0]])
                * Rotation.from_quat(q2n[:, [1, 2, 3, 0]])).as_matrix()
    np.testing.assert_allclose(R12, R_expect, atol=1e-6)


def test_pose_to_w2c_and_inverse():
    rng = np.random.default_rng(3)
    pose = np.concatenate(
        [rand_quat(rng, 16), rng.standard_normal((16, 3))], -1)
    w2c = Q.pose_to_w2c(jnp.asarray(pose))
    inv = Q.se3_inverse(w2c)
    eye = np.einsum("nij,njk->nik", np.asarray(w2c), np.asarray(inv))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), (16, 4, 4)),
                               atol=1e-5)
    # round trip through pose vector
    pose2 = Q.w2c_to_pose(w2c)
    w2c2 = Q.pose_to_w2c(pose2)
    np.testing.assert_allclose(np.asarray(w2c), np.asarray(w2c2), atol=1e-5)


def test_pose_gradients_flow():
    # the training signal for learnable poses goes through pose_to_w2c
    def loss(pose):
        w2c = Q.pose_to_w2c(pose)
        pts = jnp.ones((5, 3))
        out = (w2c[:3, :3] @ pts.T).T + w2c[:3, 3]
        return (out**2).sum()

    g = jax.grad(loss)(jnp.asarray([1.0, 0.1, -0.2, 0.3, 0.5, -0.5, 2.0]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(4)
    q = rand_quat(rng, 8)
    v = rng.standard_normal((8, 3))
    out = Q.quat_rotate(jnp.asarray(q), jnp.asarray(v))
    R = np.asarray(Q.quat_to_rotmat(jnp.asarray(q)))
    np.testing.assert_allclose(
        np.asarray(out), np.einsum("nij,nj->ni", R, v), atol=1e-6)
