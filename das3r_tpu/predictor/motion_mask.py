"""Per-pair motion masks from flow-vs-ego-flow disagreement.

TPU-native equivalent of the reference's legacy RAFT motion-mask path
(dynamic_predictor/dust3r/cloud_opt/motion_mask_from_raft.py:54-94 and
camera_estimator.py:10-62): for each stereo pair, estimate the camera
intrinsics/relative pose from the predictor's pointmaps, compute the flow
a STATIC scene would induce under that camera motion (ego flow), and flag
pixels whose observed optical flow disagrees — after per-pair min-max
normalization — above ``motion_mask_thre`` as dynamic.

DAS3R itself supersedes this with the predictor's learned dynamic masks
(``use_pred_mask``); this module keeps the legacy capability available.

Composition of existing pieces: Weiszfeld focal + SQPnP extrinsics
(``alignment.py``), ``warping.ego_flow_from_disp`` (the goem_opt
DepthBasedWarping math) and RAFT flows from ``flow.compute_edge_flows``.

Fidelity note: the reference's ``get_flow`` builds its pair stack as
``[np.stack(imgs1), np.stack(imgs1)]`` (motion_mask_from_raft.py:22) —
the SAME image list twice — so its observed "flow" is identically zero
and the mask degenerates to thresholded normalized ego-flow magnitude.
This implementation takes real (i -> j) flows; pass zero flows to
reproduce the reference's literal behavior.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from das3r_tpu.predictor.alignment import estimate_focal_weiszfeld
from das3r_tpu.predictor.warping import ego_flow_from_disp


def estimate_pair_camera(pts3d_n: np.ndarray, pts3d_m_in_n: np.ndarray,
                         im_conf_m: np.ndarray, min_conf_thr: float = 3.0):
    """Per-pair camera estimate (camera_estimator.py:10-62).

    ``pts3d_n`` [H, W, 3]: view n's pointmap in its own camera frame —
    gives focal (Weiszfeld) and depth_n. ``pts3d_m_in_n`` [H, W, 3]: view
    m's pointmap expressed in n's frame — SQPnP against m's pixel grid
    gives the n->m relative pose (cam-to-world of m in n's frame).

    Returns (K [3,3], focal, R_mn [3,3], T_mn [3], depth_n [H,W],
    depth_m [H,W]); identity pose on PnP failure, like the reference's
    try/except."""
    import cv2

    H, W, _ = pts3d_n.shape
    pp = np.asarray([W / 2.0, H / 2.0], np.float64)
    focal = estimate_focal_weiszfeld(pts3d_n, pp)
    K = np.float32([[focal, 0, pp[0]], [0, focal, pp[1]], [0, 0, 1]])

    xx, yy = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    pixels = np.stack([xx, yy], -1).reshape(-1, 2).astype(np.float64)
    msk = (im_conf_m > min_conf_thr).reshape(-1)
    pose = np.eye(4, dtype=np.float32)
    pts = pts3d_m_in_n.reshape(-1, 3).astype(np.float64)
    if int(msk.sum()) >= 6:
        ok, rvec, tvec, _ = cv2.solvePnPRansac(
            pts[msk], pixels[msk], K, None, iterationsCount=100,
            reprojectionError=5, flags=cv2.SOLVEPNP_SQPNP)
        if ok:
            w2c = np.eye(4)
            w2c[:3, :3] = cv2.Rodrigues(rvec)[0]
            w2c[:3, 3] = tvec.ravel()
            pose = np.linalg.inv(w2c).astype(np.float32)  # cam m in frame n

    depth_n = pts3d_n[..., 2]
    inv_pose = np.linalg.inv(pose)
    flat = pts3d_m_in_n.reshape(-1, 3) @ inv_pose[:3, :3].T + inv_pose[:3, 3]
    depth_m = flat.reshape(H, W, 3)[..., 2]
    return K, focal, pose[:3, :3], pose[:3, 3], depth_n, depth_m


def pair_motion_mask(pts3d_n: np.ndarray, pts3d_m_in_n: np.ndarray,
                     im_conf_m: np.ndarray, flow_nm,
                     motion_mask_thre: float = 0.35,
                     eps: float = 1e-6):
    """Dynamic mask for one pair (motion_mask_from_raft.py:65-92).

    ``flow_nm`` [2, H, W]: observed optical flow n -> m. Returns
    (mask [H, W] bool, err_norm [H, W] float32)."""
    K, _, R, T, depth_n, _ = estimate_pair_camera(
        pts3d_n, pts3d_m_in_n, im_conf_m)
    H, W = depth_n.shape
    Kj = jnp.asarray(K, jnp.float32)[None]
    # reference call: src pose = identity, tgt = (R_mn, T_mn); the warp
    # convention (cam-to-world) matches relative_transform's inputs
    disp = jnp.asarray(1.0 / (depth_n + eps), jnp.float32)[None, None]
    ego, _ = ego_flow_from_disp(
        jnp.eye(3)[None], jnp.zeros((1, 3, 1)),
        jnp.asarray(R, jnp.float32)[None],
        jnp.asarray(T, jnp.float32).reshape(1, 3, 1),
        disp, Kj, jnp.linalg.inv(Kj))
    err = jnp.linalg.norm(ego[0, :2] - jnp.asarray(flow_nm, jnp.float32),
                          axis=0)
    err = (err - err.min()) / (err.max() - err.min() + eps)
    return np.asarray(err > motion_mask_thre), np.asarray(err, np.float32)


def motion_masks_from_pairs(pred1_pts3d, pred2_pts3d_in_other, im_confs,
                            flows_ij, motion_mask_thre: float = 0.35):
    """All-pairs driver (``get_motion_mask_from_pairs``): stacks of
    [E, H, W, 3] pointmaps, [E, H, W] confidences and [E, 2, H, W] flows
    -> list of [H, W] bool masks."""
    masks = []
    for e in range(len(pred1_pts3d)):
        m, _ = pair_motion_mask(
            np.asarray(pred1_pts3d[e]), np.asarray(pred2_pts3d_in_other[e]),
            np.asarray(im_confs[e]), flows_ij[e],
            motion_mask_thre=motion_mask_thre)
        masks.append(m)
    return masks
