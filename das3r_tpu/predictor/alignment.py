"""Global alignment: turn pairwise pointmap/mask predictions into a
consistent set of per-frame depth maps, camera poses, intrinsics and
dynamic-ness maps.

TPU re-design of the reference's PointCloudOptimizer stack
(dynamic_predictor/dust3r/cloud_opt/: base_opt.py:44-619, optimizer.py:30-781,
init_im_poses.py:88-364, commons.py):

  * graph construction + confidence/dynamic-mask aggregation (host, numpy);
  * MST initialization: conf-weighted rigid registration (our own weighted
    Umeyama replaces roma), Weiszfeld focal, RANSAC-PnP fallback (cv2);
  * the 300-iteration optimization is ONE jitted Adam loop over statically
    shaped stacked parameters — the reference already "batchifies"
    (optimizer.py:72-91), which maps directly onto fixed-shape jnp;
  * losses: conf-weighted pairwise 3D consistency, temporal pose smoothing,
    optional ego-flow vs. precomputed optical flow (smooth-L1 on static
    pixels, per-pixel clip, edge skip over a loss threshold), optional
    scale-invariant depth prior.

Conventions follow the reference exactly: alignment quaternions are XYZW
(roma), translations stored signed-log1p, pairwise poses carry a log-scale
whose product is normalized to base_scale=0.5; focal stored as
focal_break * log(f).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from das3r_tpu.predictor import warping
from das3r_tpu.train import optim as optim_mod
from das3r_tpu.utils import schedules


# ---------------------------------------------------------------------------
# config


@dataclasses.dataclass(frozen=True)
class AlignerConfig:
    niter: int = 300
    lr: float = 0.01
    lr_min: float = 1e-3
    schedule: str = "linear"            # linear | cosine | cycleN
    dist: str = "l1"
    conf_mode: str = "log"              # weight transform for confidences
    min_conf_thr: float = 3.0
    base_scale: float = 0.5
    pw_break: float = 20.0
    focal_break: float = 20.0
    shared_focal: bool = True
    optimize_pp: bool = False
    temporal_smoothing_weight: float = 0.01
    translation_weight: float = 0.1
    flow_loss_weight: float = 0.01
    flow_loss_start_ratio: float = 0.15
    flow_loss_thre: float = 25.0
    pxl_thre: float = 50.0
    depth_regularize_weight: float = 0.0
    motion_mask_thre: float = 0.35
    # Known-focal preset (reference preset_focal, optimizer.py:309-334;
    # used by pose_eval's --use_gt_focal flow, pose_eval.py:129-144):
    # per-frame focals in model pixels (or a single shared value). When
    # set, focal_log is initialized from these and FROZEN (lr 0 — the
    # requires_grad=False of the reference).
    preset_focals: tuple | None = None


class EdgeData(NamedTuple):
    """Stacked pairwise predictions for E edges over F frames of H x W."""
    ei: jax.Array          # [E] int32
    ej: jax.Array          # [E] int32
    pred_i: jax.Array      # [E, H, W, 3]  view-i pointmap in frame i
    pred_j: jax.Array      # [E, H, W, 3]  view-j pointmap in frame i
    conf_i: jax.Array      # [E, H, W]
    conf_j: jax.Array      # [E, H, W]
    mask_i: jax.Array      # [E, H, W]  dynamic prob of frame i from edge e


class AlignParams(NamedTuple):
    pw_poses: jax.Array    # [E, 8]  xyzw quat, signed-log t, log scale
    im_poses: jax.Array    # [F, 7]  xyzw quat, signed-log t (cam-to-world)
    depth_log: jax.Array   # [F, H, W]
    focal_log: jax.Array   # [1] or [F]  focal_break * log(f)
    pp_off: jax.Array      # [F, 2]


class AlignedScene(NamedTuple):
    """Host-side numpy results (the stage-1 -> stage-2 handoff payload)."""
    depths: np.ndarray          # [F, H, W]
    poses_c2w: np.ndarray       # [F, 4, 4]
    focals: np.ndarray          # [F]
    intrinsics: np.ndarray      # [F, 3, 3]
    im_conf: np.ndarray         # [F, H, W]  max-aggregated confidence
    dyna_avg: np.ndarray        # [F, H, W]
    dyna_max: np.ndarray        # [F, H, W]
    dynamic_masks: np.ndarray   # [F, H, W] bool (dyna_avg > thre)
    final_loss: float


# ---------------------------------------------------------------------------
# small math helpers (jnp, differentiable)


def _safe_norm(d, axis=-1):
    """L2 norm with torch's subgradient-zero-at-zero convention (jnp's norm
    has NaN gradient at 0, which exact pairwise residuals would hit)."""
    sq = (d * d).sum(axis)
    safe = jnp.where(sq > 0, sq, 1.0)
    return jnp.where(sq > 0, jnp.sqrt(safe), 0.0)


def signed_log1p(x):
    return jnp.sign(x) * jnp.log1p(jnp.abs(x))


def signed_expm1(x):
    return jnp.sign(x) * jnp.expm1(jnp.abs(x))


def quat_xyzw_to_rotmat(q):
    """Normalized rotation from possibly-unnormalized xyzw quats [..., 4]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], -2)


def rotmat_to_quat_xyzw(R: np.ndarray) -> np.ndarray:
    from das3r_tpu.data.colmap import rotmat2qvec
    w, x, y, z = rotmat2qvec(np.asarray(R, np.float64))
    return np.asarray([x, y, z, w], np.float32)


def pose7_to_mat(p):
    """[..., 7] xyzw + signed-log t -> [..., 4, 4] (base_opt._get_poses)."""
    R = quat_xyzw_to_rotmat(p[..., :4])
    t = signed_expm1(p[..., 4:7])
    top = jnp.concatenate([R, t[..., :, None]], -1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0, 0, 0, 1], p.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], -2)


def weighted_rigid_registration(x: np.ndarray, y: np.ndarray,
                                w: np.ndarray):
    """Weighted Umeyama: find (s, R, T) minimizing sum w |s R x + T - y|^2
    (replaces roma.rigid_points_registration, base_opt.py:252/267)."""
    x = x.reshape(-1, 3).astype(np.float64)
    y = y.reshape(-1, 3).astype(np.float64)
    w = w.reshape(-1).astype(np.float64)
    w = w / w.sum().clip(1e-12)
    mx = (w[:, None] * x).sum(0)
    my = (w[:, None] * y).sum(0)
    xc = x - mx
    yc = y - my
    cov = (w[:, None] * yc).T @ xc
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_x = (w * (xc ** 2).sum(1)).sum()
    s = float(np.trace(np.diag(D) @ S) / max(var_x, 1e-12))
    T = my - s * R @ mx
    return s, R.astype(np.float32), T.astype(np.float32)


def estimate_focal_weiszfeld(pts3d: np.ndarray, pp: np.ndarray,
                             iters: int = 10) -> float:
    """Reprojection focal estimator (post_process.py:12-60, weiszfeld)."""
    H, W, _ = pts3d.shape
    xx, yy = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    pixels = np.stack([xx, yy], -1).reshape(-1, 2) - pp[None]
    p = pts3d.reshape(-1, 3).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        xy_over_z = np.nan_to_num(p[:, :2] / p[:, 2:3],
                                  posinf=0, neginf=0)
    dot_xy_px = (xy_over_z * pixels).sum(-1)
    dot_xy_xy = (xy_over_z ** 2).sum(-1)
    focal = dot_xy_px.mean() / max(dot_xy_xy.mean(), 1e-12)
    for _ in range(iters):
        dis = np.linalg.norm(pixels - focal * xy_over_z, axis=-1)
        w = 1.0 / np.clip(dis, 1e-8, None)
        focal = (w * dot_xy_px).mean() / max((w * dot_xy_xy).mean(), 1e-12)
    return float(focal)


# ---------------------------------------------------------------------------
# host-side graph aggregation + MST init


def aggregate_frame_maps(edges, conf_i, conf_j, mask_i, n_frames):
    """Per-frame max-confidence and avg/max dynamic-ness
    (base_opt._compute_img_conf :233-239, _compute_img_mmask :220-231)."""
    H, W = conf_i.shape[1:]
    im_conf = np.zeros((n_frames, H, W), np.float32)
    dyn_sum = np.zeros((n_frames, H, W), np.float32)
    dyn_max = np.zeros((n_frames, H, W), np.float32)
    i_count = np.zeros(n_frames, np.int64)
    for e, (i, j) in enumerate(edges):
        im_conf[i] = np.maximum(im_conf[i], conf_i[e])
        im_conf[j] = np.maximum(im_conf[j], conf_j[e])
        dyn_sum[i] += mask_i[e]
        dyn_max[i] = np.maximum(dyn_max[i], mask_i[e])
        i_count[i] += 1
    dyn_avg = dyn_sum / np.maximum(i_count, 1)[:, None, None]
    return im_conf, dyn_avg, dyn_max


def mst_init(edges, pred_i, pred_j, conf_i, conf_j, im_conf,
             cfg: AlignerConfig):
    """Minimum-spanning-tree pose/depth/focal initialization
    (init_im_poses.py:88-254). All numpy. Returns (pts3d [F,H,W,3] world,
    im_poses [F,4,4] c2w, im_focals [F])."""
    import scipy.sparse as sp
    import cv2

    n = im_conf.shape[0]
    H, W = im_conf.shape[1:]
    pp = np.asarray([W / 2, H / 2], np.float32)

    escore = {}
    for e, (i, j) in enumerate(edges):
        escore[(i, j)] = float(conf_i[e].mean() * conf_j[e].mean())
    graph = sp.dok_array((n, n))
    for (i, j), v in escore.items():
        graph[i, j] = -v
    msp = sp.csgraph.minimum_spanning_tree(graph.tocsr()).tocoo()

    edge_lookup = {(i, j): e for e, (i, j) in enumerate(edges)}
    todo = sorted(zip(-msp.data, msp.row, msp.col))
    pts3d = [None] * n
    im_poses: list = [None] * n
    im_focals: list = [None] * n

    score, i, j = todo.pop()
    e = edge_lookup[(int(i), int(j))]
    pts3d[i] = pred_i[e].copy()
    pts3d[j] = pred_j[e].copy()
    done = {int(i), int(j)}
    im_poses[i] = np.eye(4, dtype=np.float32)
    im_focals[i] = estimate_focal_weiszfeld(pred_i[e], pp)

    while todo:
        score, i, j = todo.pop()
        i, j = int(i), int(j)
        e = edge_lookup[(i, j)]
        if im_focals[i] is None:
            im_focals[i] = estimate_focal_weiszfeld(pred_i[e], pp)
        if i in done:
            s, R, T = weighted_rigid_registration(pred_i[e], pts3d[i],
                                                  conf_i[e])
            trf = np.eye(4, dtype=np.float32)
            trf[:3, :3] = s * R
            trf[:3, 3] = T
            pts3d[j] = pred_j[e] @ trf[:3, :3].T + trf[:3, 3]
            done.add(j)
            if im_poses[i] is None:
                pose = np.eye(4, dtype=np.float32)
                pose[:3, :3] = R
                pose[:3, 3] = T
                im_poses[i] = pose
        elif j in done:
            s, R, T = weighted_rigid_registration(pred_j[e], pts3d[j],
                                                  conf_j[e])
            trf = np.eye(4, dtype=np.float32)
            trf[:3, :3] = s * R
            trf[:3, 3] = T
            pts3d[i] = pred_i[e] @ trf[:3, :3].T + trf[:3, 3]
            done.add(i)
            if im_poses[i] is None:
                pose = np.eye(4, dtype=np.float32)
                pose[:3, :3] = R
                pose[:3, 3] = T
                im_poses[i] = pose
        else:
            todo.insert(0, (score, i, j))

    # missing focals from best remaining edges
    for (i, j), v in sorted(escore.items(), key=lambda kv: -kv[1]):
        if im_focals[i] is None:
            im_focals[i] = estimate_focal_weiszfeld(
                pred_i[edge_lookup[(i, j)]], pp)

    # missing poses via RANSAC-PnP (init_im_poses.fast_pnp :292-335)
    xx, yy = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    pixels = np.stack([xx, yy], -1).astype(np.float32)
    for i in range(n):
        if im_poses[i] is None and pts3d[i] is not None:
            msk = im_conf[i] > cfg.min_conf_thr
            if msk.sum() >= 4:
                focal = im_focals[i] or max(H, W)
                K = np.float32([[focal, 0, pp[0]], [0, focal, pp[1]],
                                [0, 0, 1]])
                try:
                    ok, rvec, tvec, _ = cv2.solvePnPRansac(
                        pts3d[i][msk], pixels[msk], K, None,
                        iterationsCount=10, reprojectionError=5,
                        flags=cv2.SOLVEPNP_SQPNP)
                except cv2.error:
                    ok = False
                if ok:
                    Rm = cv2.Rodrigues(rvec)[0]
                    w2c = np.eye(4, dtype=np.float32)
                    w2c[:3, :3] = Rm
                    w2c[:3, 3] = tvec.ravel()
                    im_poses[i] = np.linalg.inv(w2c)
        if im_poses[i] is None:
            im_poses[i] = np.eye(4, dtype=np.float32)
        if im_focals[i] is None:
            im_focals[i] = float(max(H, W))
        if pts3d[i] is None:
            pts3d[i] = np.zeros((H, W, 3), np.float32)

    return (np.stack(pts3d), np.stack(im_poses),
            np.asarray(im_focals, np.float32))


def build_init_params(edges, pred_i, conf_i, pts3d, im_poses, im_focals,
                      cfg: AlignerConfig) -> AlignParams:
    """Write the MST solution into the parameter stacks
    (init_from_pts3d, init_im_poses.py:106-153)."""
    E = len(edges)
    F, H, W = pts3d.shape[:3]
    pw = np.zeros((E, 8), np.float32)
    for e, (i, j) in enumerate(edges):
        s, R, T = weighted_rigid_registration(pred_i[e], pts3d[i], conf_i[e])
        pw[e, :4] = rotmat_to_quat_xyzw(R)
        pw[e, 4:7] = np.sign(T / s) * np.log1p(np.abs(T / s))
        pw[e, 7] = np.log(max(s, 1e-8))

    # scale normalization factor (get_pw_norm_scale_factor :276-281)
    s_factor = float(np.exp(np.log(cfg.base_scale) - pw[:, 7].mean()))
    im_poses = im_poses.copy()
    im_poses[:, :3, 3] *= s_factor
    pts3d = pts3d * s_factor

    im7 = np.zeros((F, 7), np.float32)
    depth_log = np.zeros((F, H, W), np.float32)
    for i in range(F):
        im7[i, :4] = rotmat_to_quat_xyzw(im_poses[i][:3, :3])
        t = im_poses[i][:3, 3]
        im7[i, 4:7] = np.sign(t) * np.log1p(np.abs(t))
        w2c = np.linalg.inv(im_poses[i])
        cam_pts = pts3d[i] @ w2c[:3, :3].T + w2c[:3, 3]
        depth_log[i] = np.log(np.clip(cam_pts[..., 2], 1e-8, None))

    if cfg.shared_focal:
        focal_log = np.asarray(
            [cfg.focal_break * np.log(im_focals.mean())], np.float32)
    else:
        focal_log = cfg.focal_break * np.log(im_focals)
    return AlignParams(
        pw_poses=jnp.asarray(pw),
        im_poses=jnp.asarray(im7),
        depth_log=jnp.asarray(depth_log),
        focal_log=jnp.asarray(focal_log),
        pp_off=jnp.zeros((F, 2), jnp.float32))


# ---------------------------------------------------------------------------
# the jitted optimization


def _conf_weight(conf, mode):
    if mode == "log":
        return jnp.log(conf)
    if mode == "sqrt":
        return jnp.sqrt(conf)
    if mode == "m1":
        return conf - 1
    return conf


def make_align_loss(edge: EdgeData, dyn_masks, flows, cfg: AlignerConfig,
                    n_frames: int, height: int, width: int,
                    init_depth=None):
    """Build the jittable loss(params, it) closure.

    dyn_masks: [F, H, W] bool (binary dynamic pixels, from dyna_avg > thre);
    flows: None, or (flow_ij [E,2,H,W], flow_ji, valid_i [E,1,H,W], valid_j);
    init_depth: [F, H, W] init-time depth for the scale-invariant depth
    prior (reference optimizer.py:581-587, active when
    ``cfg.depth_regularize_weight > 0``) — dynamic pixels are weighted 2x
    via the mask-as-pixel-weight convention of goem_opt.py:15-36.
    """
    F, H, W = n_frames, height, width
    E = edge.ei.shape[0]
    w_i = _conf_weight(edge.conf_i, cfg.conf_mode).reshape(E, -1)
    w_j = _conf_weight(edge.conf_j, cfg.conf_mode).reshape(E, -1)
    pred_i = edge.pred_i.reshape(E, -1, 3)
    pred_j = edge.pred_j.reshape(E, -1, 3)
    total_area = E * H * W
    xx, yy = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32), indexing="xy")
    grid = jnp.stack([xx, yy], -1).reshape(1, -1, 2)       # [1, HW, 2]
    base_pp = jnp.asarray([W / 2, H / 2], jnp.float32)

    def get_focals(params):
        f = jnp.exp(params.focal_log / cfg.focal_break)
        return jnp.broadcast_to(f, (F,)) if cfg.shared_focal else f

    def get_pts3d_world(params):
        focals = get_focals(params)[:, None, None]
        pp = base_pp[None] + 10 * params.pp_off            # [F, 2]
        depth = jnp.exp(params.depth_log).reshape(F, -1, 1)
        xy = depth * (grid - pp[:, None, :]) / focals
        pts_cam = jnp.concatenate([xy, depth], -1)          # [F, HW, 3]
        c2w = pose7_to_mat(params.im_poses)
        return (jnp.einsum("fij,fnj->fni", c2w[:, :3, :3], pts_cam)
                + c2w[:, None, :3, 3]), c2w

    def get_pw_mats(params):
        RT = pose7_to_mat(params.pw_poses[:, :7])
        logs = params.pw_poses[:, 7]
        norm = jnp.exp(jnp.log(cfg.base_scale) - logs.mean())
        scale = jnp.exp(logs) * norm
        return RT.at[:, :3].multiply(scale[:, None, None])

    def loss_fn(params: AlignParams, it):
        pts_world, c2w = get_pts3d_world(params)
        pw = get_pw_mats(params)

        ali = jnp.einsum("eij,enj->eni", pw[:, :3, :3], pred_i) \
            + pw[:, None, :3, 3]
        alj = jnp.einsum("eij,enj->eni", pw[:, :3, :3], pred_j) \
            + pw[:, None, :3, 3]
        pi = pts_world[edge.ei]
        pj = pts_world[edge.ej]
        if cfg.dist == "l1":
            li = (_safe_norm(pi - ali) * w_i).sum()
            lj = (_safe_norm(pj - alj) * w_j).sum()
        else:
            li = (((pi - ali) ** 2).sum(-1) * w_i).sum()
            lj = (((pj - alj) ** 2).sum(-1) * w_j).sum()
        loss = (li + lj) / total_area

        if cfg.temporal_smoothing_weight > 0:
            rel = jnp.linalg.solve(c2w[:-1], c2w[1:])
            rot_l = _safe_norm(
                (rel[:, :3, :3] - jnp.eye(3)).reshape(-1, 9))
            tr_l = _safe_norm(rel[:, :3, 3])
            loss = loss + cfg.temporal_smoothing_weight * (
                rot_l + cfg.translation_weight * tr_l).sum()

        if flows is not None and cfg.flow_loss_weight > 0:
            flow_ij, flow_ji, valid_i, valid_j = flows
            focals = get_focals(params)
            pp = base_pp[None] + 10 * params.pp_off
            K = jnp.zeros((F, 3, 3)).at[:, 0, 0].set(focals) \
                .at[:, 1, 1].set(focals).at[:, :2, 2].set(pp) \
                .at[:, 2, 2].set(1.0)
            inv_K = jnp.linalg.inv(K)
            depth = jnp.exp(params.depth_log)[:, None]      # [F, 1, H, W]
            disp = 1.0 / (depth + 1e-6)
            R = c2w[:, :3, :3]
            T = c2w[:, :3, 3:]
            ego_ij, _ = warping.ego_flow_from_disp(
                R[edge.ei], T[edge.ei], R[edge.ej], T[edge.ej],
                disp[edge.ei], K[edge.ej], inv_K[edge.ei])
            ego_ji, _ = warping.ego_flow_from_disp(
                R[edge.ej], T[edge.ej], R[edge.ei], T[edge.ei],
                disp[edge.ej], K[edge.ei], inv_K[edge.ej])
            static_i = (~dyn_masks[edge.ei])[:, None]
            static_j = (~dyn_masks[edge.ej])[:, None]
            fl = (warping.smooth_l1_flow_loss(
                ego_ij[:, :2], flow_ij, static_i,
                per_pixel_thre=cfg.pxl_thre)
                + warping.smooth_l1_flow_loss(
                    ego_ji[:, :2], flow_ji, static_j,
                    per_pixel_thre=cfg.pxl_thre))
            active = it >= cfg.niter * cfg.flow_loss_start_ratio
            over_thre = (fl > cfg.flow_loss_thre) & (cfg.flow_loss_thre > 0)
            fl = jnp.where(active & ~over_thre, fl, 0.0)
            loss = loss + cfg.flow_loss_weight * fl

        if cfg.depth_regularize_weight > 0 and init_depth is not None:
            depth = jnp.exp(params.depth_log)[:, None]      # [F, 1, H, W]
            prior = warping.depth_regularization_si_weighted(
                depth, init_depth[:, None],
                pixel_wise_weight=dyn_masks[:, None].astype(jnp.float32))
            loss = loss + cfg.depth_regularize_weight * prior

        return loss

    return loss_fn


def optimize(params: AlignParams, edge: EdgeData, dyn_masks,
             cfg: AlignerConfig, n_frames: int, height: int, width: int,
             flows=None, callback=None, init_depth=None):
    """Run the Adam(0.9, 0.9) alignment loop (base_opt
    global_alignment_loop :510-580). Returns (params, final_loss).

    The ``niter`` iterations execute as ~10 ``lax.scan`` chunks (one device
    dispatch each): the per-iteration lr schedule is precomputed into an
    array the scan consumes, so the host only syncs at chunk boundaries —
    through the axon relay each dispatch costs ~10 ms, which at the
    reference's 300 iterations is ~3 s of pure overhead (docs/PERF.md).
    ``callback(it, loss)`` consequently fires once per chunk (with that
    chunk's final iteration index and loss), not once per iteration.
    """
    if cfg.depth_regularize_weight > 0 and init_depth is None:
        # the prior anchors to the depth AT ENTRY (the reference snapshots
        # init_depthmaps before the loop, optimizer.py:476-482)
        init_depth = jnp.exp(params.depth_log)
    loss_fn = make_align_loss(edge, dyn_masks, flows, cfg, n_frames,
                              height, width, init_depth=init_depth)
    state = optim_mod.adam_init(params)

    pp_lr_scale = 1.0 if cfg.optimize_pp else 0.0

    def schedule_lr(it: int) -> float:
        t = it / cfg.niter
        if cfg.schedule == "cosine":
            return schedules.cosine_lr(t, cfg.lr, cfg.lr_min)
        if cfg.schedule.startswith("cycle"):
            return schedules.cycled_lr(t, cfg.lr, cfg.lr_min)
        return schedules.linear_lr(t, cfg.lr, cfg.lr_min)

    lrs_all = jnp.asarray([schedule_lr(it) for it in range(cfg.niter)],
                          jnp.float32)
    its_all = jnp.arange(cfg.niter, dtype=jnp.int32)

    @functools.partial(jax.jit, static_argnames=("length",))
    def run_chunk(params, state, lrs, its, *, length):
        def body(carry, inp):
            params, state = carry
            lr, it = inp
            lossv, grads = jax.value_and_grad(loss_fn)(params, it)
            focal_lr = 0.0 if cfg.preset_focals is not None else lr
            lr_tree = AlignParams(
                pw_poses=lr, im_poses=lr, depth_log=lr,
                focal_log=focal_lr, pp_off=lr * pp_lr_scale)
            new_params, new_state = optim_mod.adam_step(
                params, grads, state, lr_tree, b1=0.9, b2=0.9, eps=1e-8)
            return (new_params, new_state), lossv

        (params, state), losses = jax.lax.scan(
            body, (params, state), (lrs, its), length=length)
        return params, state, losses[-1]

    # Equal-size chunks (one compile) + at most one remainder chunk (a
    # second compile).
    chunk = max(1, -(-cfg.niter // 10))
    lossv = jnp.inf
    it = 0
    while it < cfg.niter:
        size = min(chunk, cfg.niter - it)
        params, state, lossv = run_chunk(
            params, state, lrs_all[it:it + size], its_all[it:it + size],
            length=size)
        it += size
        if callback is not None:
            callback(it - 1, float(lossv))
    return params, float(lossv)


# ---------------------------------------------------------------------------
# top-level API


def align(edges: list, pred_i, pred_j, conf_i, conf_j, mask_i,
          cfg: AlignerConfig = AlignerConfig(), flows=None,
          callback=None) -> AlignedScene:
    """Full pipeline: aggregation -> MST init -> jitted optimization ->
    extraction (the ``global_aligner`` + ``compute_global_alignment`` flow,
    cloud_opt/__init__.py:19-30, base_opt.py:456-471).

    Inputs are numpy stacks over E edges; ``edges`` is a list of (i, j).
    """
    pred_i = np.asarray(pred_i, np.float32)
    pred_j = np.asarray(pred_j, np.float32)
    conf_i = np.asarray(conf_i, np.float32)
    conf_j = np.asarray(conf_j, np.float32)
    mask_i = np.asarray(mask_i, np.float32)
    n_frames = max(max(e) for e in edges) + 1
    E, H, W = conf_i.shape

    im_conf, dyna_avg, dyna_max = aggregate_frame_maps(
        edges, conf_i, conf_j, mask_i, n_frames)
    dyn_bin = dyna_avg > cfg.motion_mask_thre

    pts3d, im_poses, im_focals = mst_init(
        edges, pred_i, pred_j, conf_i, conf_j, im_conf, cfg)
    if cfg.preset_focals is not None:
        im_focals = np.broadcast_to(
            np.asarray(cfg.preset_focals, np.float32).reshape(-1),
            (n_frames,)).copy()
    params = build_init_params(edges, pred_i, conf_i, pts3d, im_poses,
                               im_focals, cfg)

    edge_data = EdgeData(
        ei=jnp.asarray([i for i, _ in edges], jnp.int32),
        ej=jnp.asarray([j for _, j in edges], jnp.int32),
        pred_i=jnp.asarray(pred_i), pred_j=jnp.asarray(pred_j),
        conf_i=jnp.asarray(conf_i), conf_j=jnp.asarray(conf_j),
        mask_i=jnp.asarray(mask_i))

    params, final_loss = optimize(
        params, edge_data, jnp.asarray(dyn_bin), cfg, n_frames, H, W,
        flows=flows, callback=callback)

    # extract results
    depths = np.asarray(jnp.exp(params.depth_log))
    c2w = np.asarray(pose7_to_mat(params.im_poses))
    if cfg.shared_focal:
        focals = np.full(n_frames,
                         float(np.exp(params.focal_log[0] / cfg.focal_break)),
                         np.float32)
    else:
        focals = np.asarray(jnp.exp(params.focal_log / cfg.focal_break))
    pp = np.asarray([W / 2, H / 2], np.float32)[None] \
        + 10 * np.asarray(params.pp_off)
    K = np.zeros((n_frames, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = focals
    K[:, :2, 2] = pp
    K[:, 2, 2] = 1
    return AlignedScene(
        depths=depths, poses_c2w=c2w, focals=focals, intrinsics=K,
        im_conf=im_conf, dyna_avg=dyna_avg, dyna_max=dyna_max,
        dynamic_masks=dyn_bin, final_loss=final_loss)


def clean_pointcloud(im_confs: np.ndarray, intrinsics: np.ndarray,
                     poses_c2w: np.ndarray, depths: np.ndarray,
                     tol: float = 0.001, bad_conf: float = 0.0
                     ) -> np.ndarray:
    """Cross-view depth-consistency confidence suppression
    (base_opt.clean_pointcloud :584-619): a pixel whose 3D point lands IN
    FRONT of another view's depth map while being less confident gets its
    confidence clipped to ``bad_conf``. Host-side numpy (one-shot, not hot).

    im_confs/depths [F, H, W]; intrinsics [F, 3, 3]; poses_c2w [F, 4, 4].
    """
    F, H, W = im_confs.shape
    res = im_confs.copy()
    w2c = np.linalg.inv(poses_c2w)

    # world points of every frame
    xx, yy = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    pts_world = np.empty((F, H, W, 3), np.float32)
    for f in range(F):
        K = intrinsics[f]
        z = depths[f]
        cam = np.stack([z * (xx - K[0, 2]) / K[0, 0],
                        z * (yy - K[1, 2]) / K[1, 1], z], -1)
        pts_world[f] = cam @ poses_c2w[f, :3, :3].T + poses_c2w[f, :3, 3]

    for i in range(F):
        for j in range(F):
            if i == j:
                continue
            proj = pts_world[i] @ w2c[j, :3, :3].T + w2c[j, :3, 3]
            z = proj[..., 2]
            K = intrinsics[j]
            with np.errstate(divide="ignore", invalid="ignore"):
                u = np.round(proj[..., 0] / z * K[0, 0] + K[0, 2])
                v = np.round(proj[..., 1] / z * K[1, 1] + K[1, 2])
            msk = (z > 0) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
            ui = np.where(msk, u, 0).astype(np.int64)
            vi = np.where(msk, v, 0).astype(np.int64)
            bad = (msk
                   & (z < (1 - tol) * depths[j][vi, ui])
                   & (res[i] < res[j][vi, ui]))
            res[i][bad] = np.minimum(res[i][bad], bad_conf)
    return res


def pair_view(edges: list, pred_i, pred_j, conf_i, conf_j, mask_i,
              cfg: AlignerConfig = AlignerConfig()) -> AlignedScene:
    """Closed-form 2-frame scene — no optimization (the reference's
    PairViewer, cloud_opt/pair_viewer.py:15-112, selected by
    ``global_aligner(mode=PairViewer)`` when exactly one symmetrized pair
    exists). Per view: Weiszfeld focal from its own pointmap, relative pose
    by PnP-RANSAC of the cross-view pointmap against the pixel grid; the
    more confident direction wins and anchors the world at that camera.
    """
    import cv2

    assert sorted(edges) == [(0, 1), (1, 0)], \
        f"pair_view needs one symmetrized pair, got {edges}"
    pred_i = np.asarray(pred_i, np.float32)
    pred_j = np.asarray(pred_j, np.float32)
    conf_i = np.asarray(conf_i, np.float32)
    conf_j = np.asarray(conf_j, np.float32)
    mask_i = np.asarray(mask_i, np.float32)
    E, H, W = conf_i.shape
    pp = np.asarray([W / 2, H / 2], np.float32)
    eidx = {tuple(e): k for k, e in enumerate(edges)}

    im_conf, dyna_avg, dyna_max = aggregate_frame_maps(
        edges, conf_i, conf_j, mask_i, 2)

    xx, yy = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    pixels = np.stack([xx, yy], -1).astype(np.float32)    # [H, W, (x, y)]

    confs, focals, rel_poses = [], [], []
    for i in range(2):
        e = eidx[(i, 1 - i)]
        confs.append(float(conf_i[e].mean() * conf_j[e].mean()))
        focal = estimate_focal_weiszfeld(pred_i[e], pp)
        focals.append(focal)

        # pose of camera i from its pointmap expressed in the OTHER view
        pts = pred_j[eidx[(1 - i, i)]]
        msk = im_conf[i] > cfg.min_conf_thr
        pose = np.eye(4, dtype=np.float32)
        if int(msk.sum()) >= 6:
            K = np.float32([[focal, 0, pp[0]], [0, focal, pp[1]], [0, 0, 1]])
            ok, rvec, tvec, _ = cv2.solvePnPRansac(
                pts[msk].astype(np.float64),
                pixels[msk].astype(np.float64), K, None,
                iterationsCount=100, reprojectionError=5,
                flags=cv2.SOLVEPNP_SQPNP)
            if ok:
                w2c = np.eye(4)
                w2c[:3, :3] = cv2.Rodrigues(rvec)[0]
                w2c[:3, 3] = tvec.ravel()
                pose = np.linalg.inv(w2c).astype(np.float32)
        rel_poses.append(pose)

    def _transformed_depth(pose, pts):
        inv_pose = np.linalg.inv(pose)
        flat = pts.reshape(-1, 3) @ inv_pose[:3, :3].T + inv_pose[:3, 3]
        return flat[:, 2].reshape(H, W)

    if confs[0] > confs[1]:           # world = camera 1's frame
        e = eidx[(0, 1)]
        poses = np.stack([np.eye(4, dtype=np.float32), rel_poses[1]])
        depths = np.stack([pred_i[e][..., 2],
                           _transformed_depth(rel_poses[1], pred_j[e])])
    else:                             # world = camera 2's frame
        e = eidx[(1, 0)]
        poses = np.stack([rel_poses[0], np.eye(4, dtype=np.float32)])
        depths = np.stack([_transformed_depth(rel_poses[0], pred_j[e]),
                           pred_i[e][..., 2]])

    f = np.asarray(focals, np.float32)
    K = np.zeros((2, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = f
    K[:, :2, 2] = pp
    K[:, 2, 2] = 1
    return AlignedScene(
        depths=depths.astype(np.float32), poses_c2w=poses, focals=f,
        intrinsics=K, im_conf=im_conf, dyna_avg=dyna_avg,
        dyna_max=dyna_max, dynamic_masks=dyna_avg > cfg.motion_mask_thre,
        final_loss=0.0)
