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
