"""Depth/pose-based ego-motion flow and flow-consistency masks (pure jnp).

TPU-native equivalents of the CasualSAM-derived ops in the reference's
dynamic_predictor/dust3r/utils/goem_opt.py used by the global-alignment flow
loss: ``warp_by_disp`` (:195-236), ``OccMask`` (:575-640), ``WarpImage``
(grid-sample, :38-69) and ``depth_regularization_si_weighted`` (:15-36).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _pixel_coords_hom(h: int, w: int, dtype=jnp.float32) -> jax.Array:
    """[3, H*W] homogeneous pixel coordinates (x, y, 1)."""
    xx, yy = jnp.meshgrid(jnp.arange(w, dtype=dtype),
                          jnp.arange(h, dtype=dtype), indexing="xy")
    return jnp.stack([xx.reshape(-1), yy.reshape(-1),
                      jnp.ones(h * w, dtype)], 0)


def relative_transform(src_R, src_t, tgt_R, tgt_t):
    """R/t of src camera expressed in tgt frame (goem_opt.py:150-154).
    src_R [*, 3, 3], src_t [*, 3, 1]."""
    tgt_R_inv = jnp.swapaxes(tgt_R, -1, -2)
    rel_R = tgt_R_inv @ src_R
    rel_t = tgt_R_inv @ (src_t - tgt_t)
    return rel_R, rel_t


def ego_flow_from_disp(src_R, src_t, tgt_R, tgt_t, src_disp, K, inv_K,
                       eps: float = 1e-6):
    """Ego-motion flow field via homography + parallax (``warp_by_disp``).

    Args: rotations [B, 3, 3], translations [B, 3, 1], disparity
    [B, 1, H, W], K/inv_K [B, 3, 3] (camera-to-world R/t convention as in
    the reference: x_world = R x_cam + t).

    Returns (flow [B, 3, H, W] — (dx, dy, dw) like the reference, use
    [:, :2]; tgt_coord [B, 3, H*W]).
    """
    B, _, H, W = src_disp.shape
    coord = _pixel_coords_hom(H, W, src_disp.dtype)[None]     # [1, 3, HW]
    rel_R, rel_t = relative_transform(src_R, src_t, tgt_R, tgt_t)
    H_mat = K @ rel_R @ inv_K                                  # [B, 3, 3]
    flat_disp = src_disp.reshape(B, 1, H * W)
    tgt_coord = H_mat @ coord + flat_disp * (K @ rel_t)
    tgt_coord = tgt_coord / (tgt_coord[:, -1:, :] + eps)
    return (tgt_coord - coord).reshape(B, 3, H, W), tgt_coord


def bilinear_sample(img: jax.Array, coords_xy: jax.Array,
                    align_corners: bool = True) -> jax.Array:
    """grid_sample equivalent: img [B, C, H, W], coords_xy [B, H', W', 2] in
    PIXEL units; zero padding outside."""
    B, C, H, W = img.shape
    x = coords_xy[..., 0]
    y = coords_xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(yi, xi):
        valid = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        out = jax.vmap(lambda im, yy, xx: im[:, yy, xx])(img, yc, xc)
        return out * valid[:, None].astype(img.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx_ = wx[:, None]
    wy_ = wy[:, None]
    top = v00 * (1 - wx_) + v01 * wx_
    bot = v10 * (1 - wx_) + v11 * wx_
    return top * (1 - wy_) + bot * wy_


def occlusion_valid_mask(flow_12: jax.Array, flow_21: jax.Array,
                         th: float = 3.0) -> jax.Array:
    """Forward/backward flow-consistency validity (``OccMask``): a pixel is
    valid if |flow_12 + flow_21(warped)| < th and its target is in bounds.
    flows: [B, 2, H, W]. Returns [B, 1, H, W] bool."""
    B, _, H, W = flow_12.shape
    xx, yy = jnp.meshgrid(jnp.arange(W, dtype=flow_12.dtype),
                          jnp.arange(H, dtype=flow_12.dtype), indexing="xy")
    base = jnp.stack([xx, yy], -1)[None]                      # [1, H, W, 2]
    target = base + flow_12.transpose(0, 2, 3, 1)
    oob = ((target[..., 0] < 0) | (target[..., 0] > W - 1)
           | (target[..., 1] < 0) | (target[..., 1] > H - 1))
    sampled = bilinear_sample(flow_21, target)                # [B, 2, H, W]
    inconsistency = jnp.abs((sampled + flow_12).sum(1, keepdims=True))
    return (inconsistency < th) & ~oob[:, None]


def smooth_l1_flow_loss(estimate, gt, mask, beta: float = 1.0,
                        per_pixel_thre: float = 50.0):
    """Masked smooth-L1 with per-pixel outlier clipping
    (reference cloud_opt/optimizer.py:18-24)."""
    diff = estimate * mask - gt * mask
    ad = jnp.abs(diff)
    raw = jnp.where(ad < beta, 0.5 * diff * diff / beta, ad - 0.5 * beta)
    if per_pixel_thre > 0:
        m = (raw < per_pixel_thre) * mask
    else:
        m = mask
    return jnp.sum(raw * m) / jnp.maximum(jnp.sum(m), 1.0)


def depth_regularization_si_weighted(depth_pred, depth_init,
                                     pixel_wise_weight=None,
                                     pixel_wise_weight_scale: float = 1.0,
                                     pixel_wise_weight_bias: float = 1.0,
                                     eps: float = 1e-6):
    """Scale-invariant log-depth prior (goem_opt.py:15-36).

    depth_* : [B, 1, H, W]. ``pixel_wise_weight`` (same shape, optional)
    reweights pixels as ``weight * scale + bias`` — the reference's
    optimizer passes the binary dynamic mask here (optimizer.py:583-585),
    so dynamic pixels get weight 2 and static pixels weight 1: the depth
    prior anchors moving regions (whose pairwise/flow losses are masked
    out) hardest to the init depth."""
    dp = jnp.log(jnp.maximum(depth_pred, eps))
    di = jnp.log(jnp.maximum(depth_init, eps))
    B, _, H, W = depth_pred.shape
    scale = jnp.sum(di - dp, axis=(1, 2, 3), keepdims=True) / (H * W)
    if pixel_wise_weight is None:
        w = 1.0
    else:
        w = (pixel_wise_weight * pixel_wise_weight_scale
             + pixel_wise_weight_bias)
    si = jnp.sum(w * (dp + scale - di) ** 2, axis=(1, 2, 3)) / (H * W)
    return jnp.mean(si)
