"""Legacy RAFT motion-mask path (predictor/motion_mask.py): per-pair
camera estimation from pointmaps and flow-vs-ego-flow dynamic masks
(reference cloud_opt/motion_mask_from_raft.py + camera_estimator.py)."""
import numpy as np

import jax.numpy as jnp

from das3r_tpu.predictor import motion_mask as mm
from das3r_tpu.predictor.warping import ego_flow_from_disp


def _synthetic_pair(H=48, W=64, focal=60.0, seed=0):
    """A textured depth field seen from two cameras with known relative
    pose; returns view-n pointmap, view-m pointmap expressed in n's frame,
    the true (K, R, T) and the induced static-scene flow n->m."""
    rng = np.random.default_rng(seed)
    pp = np.asarray([W / 2.0, H / 2.0])
    xx, yy = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    depth = 4.0 + 0.5 * np.sin(xx / 7.0) + rng.uniform(0, 0.3, (H, W))
    pts_n = np.stack([(xx - pp[0]) / focal * depth,
                      (yy - pp[1]) / focal * depth, depth], -1)

    # camera m: small rotation about y + translation (cam-to-world of m
    # expressed in n's frame)
    a = 0.03
    R = np.asarray([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                    [-np.sin(a), 0, np.cos(a)]], np.float64)
    T = np.asarray([0.08, -0.03, 0.02])

    # view m's own pointmap = world points in m's camera frame; expressed
    # in n's frame they are just pts_n again only for the SAME pixels —
    # the PnP needs m's pixel grid correspondence: point seen at m-pixel
    # (u,v) has m-frame coords K^-1 (u,v,1) d; in n's frame: R x + T.
    depth_m = 4.0 + 0.5 * np.sin(xx / 9.0) + rng.uniform(0, 0.3, (H, W))
    pts_m_own = np.stack([(xx - pp[0]) / focal * depth_m,
                          (yy - pp[1]) / focal * depth_m, depth_m], -1)
    pts_m_in_n = pts_m_own.reshape(-1, 3) @ R.T + T
    pts_m_in_n = pts_m_in_n.reshape(H, W, 3)

    K = np.float32([[focal, 0, pp[0]], [0, focal, pp[1]], [0, 0, 1]])
    return pts_n, pts_m_in_n, K, R, T


class TestPairCamera:
    def test_recovers_focal_and_pose(self):
        pts_n, pts_m_in_n, K_true, R_true, T_true = _synthetic_pair()
        conf = np.full(pts_n.shape[:2], 10.0, np.float32)
        K, focal, R, T, depth_n, _ = mm.estimate_pair_camera(
            pts_n, pts_m_in_n, conf)
        assert abs(focal - K_true[0, 0]) / K_true[0, 0] < 0.02
        np.testing.assert_allclose(R, R_true, atol=5e-3)
        np.testing.assert_allclose(T, T_true, atol=5e-3)
        np.testing.assert_allclose(depth_n, pts_n[..., 2], atol=1e-6)

    def test_pnp_failure_returns_identity(self):
        pts_n, pts_m_in_n, *_ = _synthetic_pair()
        conf = np.zeros(pts_n.shape[:2], np.float32)  # nothing confident
        _, _, R, T, _, _ = mm.estimate_pair_camera(pts_n, pts_m_in_n, conf)
        np.testing.assert_array_equal(R, np.eye(3, dtype=np.float32))
        np.testing.assert_array_equal(T, np.zeros(3, np.float32))


class TestMotionMask:
    def test_flags_moving_region_only(self):
        """Static scene + known ego motion: observed flow = ego flow
        everywhere except an injected moving patch, which must be the
        (essentially only) region above the threshold."""
        pts_n, pts_m_in_n, K, R, T = _synthetic_pair()
        H, W = pts_n.shape[:2]
        conf = np.full((H, W), 10.0, np.float32)

        disp = jnp.asarray(1.0 / pts_n[..., 2], jnp.float32)[None, None]
        Kj = jnp.asarray(K, jnp.float32)[None]
        ego, _ = ego_flow_from_disp(
            jnp.eye(3)[None], jnp.zeros((1, 3, 1)),
            jnp.asarray(R, jnp.float32)[None],
            jnp.asarray(T, jnp.float32).reshape(1, 3, 1),
            disp, Kj, jnp.linalg.inv(Kj))
        flow = np.asarray(ego[0, :2]).copy()
        flow[:, 10:20, 15:30] += 5.0        # the moving object

        mask, err = mm.pair_motion_mask(pts_n, pts_m_in_n, conf, flow,
                                        motion_mask_thre=0.35)
        inside = mask[10:20, 15:30]
        outside = mask.copy()
        outside[10:20, 15:30] = False
        assert inside.mean() > 0.9, inside.mean()
        # estimation noise may graze the threshold at a few pixels
        assert outside.mean() < 0.05, outside.mean()

    def test_driver_stacks(self):
        pts_n, pts_m_in_n, K, R, T = _synthetic_pair()
        H, W = pts_n.shape[:2]
        conf = np.full((H, W), 10.0, np.float32)
        flows = np.zeros((2, 2, H, W), np.float32)
        masks = mm.motion_masks_from_pairs(
            np.stack([pts_n] * 2), np.stack([pts_m_in_n] * 2),
            np.stack([conf] * 2), flows)
        assert len(masks) == 2 and masks[0].shape == (H, W)
        assert masks[0].dtype == bool
