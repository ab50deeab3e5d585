"""Stage-1 training criteria (pure jnp) — the mask-head training losses
(reference dynamic_predictor/dust3r/losses.py):

  * ``regr3d_mmask``: anchor-frame pointmap regression (L21 on avg-dis
    normalized points, :142-194) + BCE on the dynamic masks (:196-288);
  * ``conf_loss``: confidence-weighted total, ``loss*conf - alpha*log conf``
    applied to BOTH the pts3d and the mask terms (:290-338).

The DAS3R training criterion is
``ConfLoss(Regr3D_MMask(L21, norm_mode='avg_dis'), alpha=0.2)``
(DAS3R_b32_g4.sh:10). All reductions are masked means expressed with
where/sum so the whole thing jits with static shapes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from das3r_tpu.utils.transforms import geotrf
from das3r_tpu.utils.quat import se3_inverse


def _masked_mean(x, mask):
    m = mask.astype(x.dtype)
    return (x * m).sum() / jnp.maximum(m.sum(), 1.0)


def normalize_pointcloud_pair(pts1, pts2, valid1, valid2, eps=1e-8):
    """Joint 'avg_dis' normalization over both views, per batch element
    (reference dust3r/utils/geometry.py:253-316)."""
    d1 = jnp.linalg.norm(pts1, axis=-1)
    d2 = jnp.linalg.norm(pts2, axis=-1)
    w1 = valid1.astype(pts1.dtype)
    w2 = valid2.astype(pts2.dtype)
    num = (d1 * w1).sum(axis=(1, 2)) + (d2 * w2).sum(axis=(1, 2))
    den = w1.sum(axis=(1, 2)) + w2.sum(axis=(1, 2))
    norm = jnp.maximum(num / jnp.maximum(den, 1.0), eps)[:, None, None, None]
    return pts1 / norm, pts2 / norm


class Stage1Batch(NamedTuple):
    """One two-view training batch (all [B, ...])."""
    gt_pts3d_1: jax.Array        # [B, H, W, 3] world frame
    gt_pts3d_2: jax.Array
    camera_pose_1: jax.Array     # [B, 4, 4] cam-to-world of view 1
    valid_1: jax.Array           # [B, H, W] bool
    valid_2: jax.Array
    gt_mask_1: jax.Array         # [B, H, W] in {0, 1}
    gt_mask_2: jax.Array


class Stage1LossOut(NamedTuple):
    total: jax.Array
    pts3d_1: jax.Array
    pts3d_2: jax.Array
    mask_1: jax.Array
    mask_2: jax.Array


def bce(pred_prob, target, eps=1e-7):
    p = jnp.clip(pred_prob, eps, 1 - eps)
    return -(target * jnp.log(p) + (1 - target) * jnp.log1p(-p))


def conf_regr3d_mmask_loss(batch: Stage1Batch, res1: dict, res2: dict,
                           alpha: float = 0.2,
                           norm_gt: bool = True) -> Stage1LossOut:
    """The full DAS3R criterion for one batch of pairs."""
    in_cam1 = se3_inverse(batch.camera_pose_1)
    B, H, W, _ = batch.gt_pts3d_1.shape
    gt1 = geotrf(in_cam1, batch.gt_pts3d_1.reshape(B, -1, 3)).reshape(
        B, H, W, 3)
    gt2 = geotrf(in_cam1, batch.gt_pts3d_2.reshape(B, -1, 3)).reshape(
        B, H, W, 3)

    pr1 = res1["pts3d"]
    pr2 = res2["pts3d_in_other_view"]
    valid1 = batch.valid_1
    valid2 = batch.valid_2

    pr1, pr2 = normalize_pointcloud_pair(pr1, pr2, valid1, valid2)
    if norm_gt:
        gt1, gt2 = normalize_pointcloud_pair(gt1, gt2, valid1, valid2)

    l1 = jnp.linalg.norm(pr1 - gt1, axis=-1)      # L21, [B, H, W]
    l2 = jnp.linalg.norm(pr2 - gt2, axis=-1)
    m1 = bce(res1["dynamic_mask"], batch.gt_mask_1)
    m2 = bce(res2["dynamic_mask"], batch.gt_mask_2)

    # confidence weighting (conf comes from the frozen heads -> constants)
    conf1 = jax.lax.stop_gradient(res1["conf"])
    conf2 = jax.lax.stop_gradient(res2["conf"])
    logc1 = jnp.log(conf1)
    logc2 = jnp.log(conf2)

    cl1 = _masked_mean(l1 * conf1 - alpha * logc1, valid1)
    cl2 = _masked_mean(l2 * conf2 - alpha * logc2, valid2)
    cm1 = _masked_mean(m1 * conf1 - alpha * logc1, valid1)
    cm2 = _masked_mean(m2 * conf2 - alpha * logc2, valid2)
    return Stage1LossOut(total=cl1 + cl2 + cm1 + cm2,
                         pts3d_1=_masked_mean(l1, valid1),
                         pts3d_2=_masked_mean(l2, valid2),
                         mask_1=_masked_mean(m1, valid1),
                         mask_2=_masked_mean(m2, valid2))


def _nan_where(x, valid):
    return jnp.where(valid, x, jnp.nan)


def joint_median_depth(z1, z2, valid1, valid2):
    """Median z over both views, invalid -> NaN-ignored
    (reference dust3r/utils/geometry.py:317-330). Returns [B]."""
    z = jnp.concatenate([_nan_where(z1, valid1).reshape(z1.shape[0], -1),
                         _nan_where(z2, valid2).reshape(z2.shape[0], -1)], -1)
    return jnp.nanmedian(z, axis=-1)


def joint_center_scale(pts1, pts2, valid1, valid2):
    """Median center + median distance-to-center over both views
    (geometry.py:332-347). Returns (center [B,1,1,3], scale [B])."""
    B = pts1.shape[0]
    p = jnp.concatenate([
        _nan_where(pts1, valid1[..., None]).reshape(B, -1, 3),
        _nan_where(pts2, valid2[..., None]).reshape(B, -1, 3)], 1)
    center = jnp.nanmedian(p, axis=1, keepdims=True)          # [B, 1, 3]
    norm = jnp.linalg.norm(p - center, axis=-1)
    scale = jnp.nanmedian(norm, axis=1)
    return center[:, None], scale


def regr3d_scale_shift_inv_loss(batch: Stage1Batch, res1: dict, res2: dict,
                                gt_scale: bool = True) -> Stage1LossOut:
    """Regr3D_ScaleShiftInv(L21, gt_scale=True) — the stage-1 TEST criterion
    (reference losses.py:341-400, MRO runs ShiftInv then ScaleInv):
    avg-dis normalize predictions, subtract the joint median depth from both,
    then rescale predictions onto the GT's median scale before the L21.

    All medians are nanmedian over valid pixels; everything is
    stop-gradient-free because this is an eval metric.
    """
    in_cam1 = se3_inverse(batch.camera_pose_1)
    B, H, W, _ = batch.gt_pts3d_1.shape
    gt1 = geotrf(in_cam1, batch.gt_pts3d_1.reshape(B, -1, 3)).reshape(
        B, H, W, 3)
    gt2 = geotrf(in_cam1, batch.gt_pts3d_2.reshape(B, -1, 3)).reshape(
        B, H, W, 3)
    pr1 = res1["pts3d"]
    pr2 = res2["pts3d_in_other_view"]
    valid1, valid2 = batch.valid_1, batch.valid_2

    # Regr3D.get_all_pts3d with gt_scale=True: preds normalized, gt raw
    pr1, pr2 = normalize_pointcloud_pair(pr1, pr2, valid1, valid2)

    # ShiftInv: subtract the joint median depth (z channel only)
    gt_shift = joint_median_depth(gt1[..., 2], gt2[..., 2], valid1, valid2)
    pr_shift = joint_median_depth(pr1[..., 2], pr2[..., 2], valid1, valid2)
    shift = lambda p, s: p.at[..., 2].add(-s[:, None, None])
    gt1, gt2 = shift(gt1, gt_shift), shift(gt2, gt_shift)
    pr1, pr2 = shift(pr1, pr_shift), shift(pr2, pr_shift)

    # ScaleInv: rescale predictions onto the GT scale (or both to unit)
    _, gts = joint_center_scale(gt1, gt2, valid1, valid2)
    _, prs = joint_center_scale(pr1, pr2, valid1, valid2)
    prs = jnp.clip(prs, 1e-3, 1e3)
    if gt_scale:
        r = (gts / prs)[:, None, None, None]
        pr1, pr2 = pr1 * r, pr2 * r
    else:
        pr1, pr2 = pr1 / prs[:, None, None, None], \
            pr2 / prs[:, None, None, None]
        gt1, gt2 = gt1 / gts[:, None, None, None], \
            gt2 / gts[:, None, None, None]

    l1 = jnp.linalg.norm(pr1 - gt1, axis=-1)
    l2 = jnp.linalg.norm(pr2 - gt2, axis=-1)
    z = jnp.zeros(())
    return Stage1LossOut(
        total=_masked_mean(l1, valid1) + _masked_mean(l2, valid2),
        pts3d_1=_masked_mean(l1, valid1), pts3d_2=_masked_mean(l2, valid2),
        mask_1=z, mask_2=z)
