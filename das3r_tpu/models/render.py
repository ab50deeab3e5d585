"""Scene-level render paths — functional equivalents of the reference's four
renderers (gaussian_renderer/__init__.py: ``render`` :23, ``render_test``
:152, ``render_no_soft`` :279, ``render_confidence`` :410).

All use the DAS3R "identity-view trick": the rasterizer sees viewmatrix = I
and Gaussians transformed into the camera frame *inside the autodiff graph*
(xyz' = w2c(q,t) @ xyz, rot' = q * rot), so the photometric loss reaches the
learnable camera pose (reference :56-93; SURVEY.md §3.3).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from das3r_tpu.models.gaussians import (
    GaussianMeta, GaussianParams, activated_opacity, activated_scaling,
    per_gaussian_conf)
from das3r_tpu.ops.splat import RasterSettings, rasterize
from das3r_tpu.utils import transforms
from das3r_tpu.utils.quat import pose_to_w2c, quat_mul


class RenderOutput(NamedTuple):
    image: jax.Array         # [3, H, W]
    radii: jax.Array         # [Nc] int32 (visibility_filter == radii > 0)
    mean2d_grad_capture: jax.Array | None  # zeros [Nc, 2] offset that was fed
    aux: object


def _camera_frame_gaussians(params: GaussianParams, camera_pose: jax.Array):
    """Transform means/orientations into the camera frame (reference :83-93)."""
    w2c = pose_to_w2c(camera_pose)
    xyz_cam = jnp.matmul(params.xyz, w2c[:3, :3].T,
                         precision="highest") + w2c[:3, 3]
    rot_cam = quat_mul(camera_pose[:4], params.rotation)
    return xyz_cam, rot_cam


def _raster_common(fovx, fovy, znear=0.01, zfar=100.0):
    """Identity viewmatrix + row-vector projection (reference :56-78).
    FoV is a traced scalar (per-frame intrinsics / learnable-FoV paths)."""
    proj = transforms.projection_matrix_dyn(znear, zfar, fovx, fovy).T
    tan_fovx = jnp.tan(jnp.asarray(fovx) * 0.5)
    tan_fovy = jnp.tan(jnp.asarray(fovy) * 0.5)
    view = jnp.eye(4, dtype=jnp.float32)
    campos = jnp.zeros(3, jnp.float32)
    return view, proj, campos, tan_fovx, tan_fovy


def render(
    params: GaussianParams,
    meta: GaussianMeta,
    settings: RasterSettings,
    camera_pose: jax.Array,        # [7] learnable (quat, t)
    bg: jax.Array,                 # [3]
    fovx: float,
    fovy: float,
    *,
    mode: str = "train",           # train | test | no_soft | confidence
    conf_per_gaussian: jax.Array | None = None,  # test mode (PLY-loaded)
    capture_mean2d_grad: bool = False,
    mean2d_offset: jax.Array | None = None,  # external zeros [Nc, 2] whose
                                             # cotangent is the densification
                                             # screen-space gradient signal
    tile_axis: str | None = None,  # mesh axis to shard image tiles over
    gauss_axis: str | None = None,  # mesh axis the Gaussian axis is sharded
                                    # over (params/preprocess shard-local,
                                    # prep outputs all-gathered)
    mesh=None,                     # Mesh owning tile_axis: enables the
                                   # shard_map'd Pallas entry-stream blend
    backend: str = "auto",
) -> RenderOutput:
    """One differentiable render of the scene from ``camera_pose``.

    mode='train'      opacity ×= conf_static gathered per Gaussian (ref :95-97)
    mode='test'       opacity ×= ``conf_per_gaussian`` (ref render_test :224)
    mode='no_soft'    no conf modulation; pass the learnable FoV as
                      fovx/fovy — gradients flow into it (ref :308-318)
    mode='confidence' opacity=1, colors = conf -> staticness image (ref :481)
    """
    # guard dead capacity slots: a degenerate (near-zero) stored quaternion
    # would inject NaN into the backward pass through quat normalization
    # even though such Gaussians are culled in the forward.
    # PERF: both where-operands must be pre-broadcast to [Nc, 4] — XLA lowers
    # a ([Nc,1] bool, [Nc,4], [4]) where ~12x slower on TPU (docs/PERF.md).
    safe_rot = jnp.where(
        jnp.broadcast_to(meta.alive[:, None], params.rotation.shape),
        params.rotation,
        jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0], params.rotation.dtype),
                         params.rotation.shape))
    params = params._replace(rotation=safe_rot)
    xyz_cam, rot_cam = _camera_frame_gaussians(params, camera_pose)
    opacity = activated_opacity(params)          # [Nc, 1]
    alive_f = meta.alive[:, None].astype(opacity.dtype)

    colors_precomp = None
    shs = jnp.concatenate([params.features_dc, params.features_rest], axis=1)

    if mode == "train":
        conf = per_gaussian_conf(params, meta)[:, None]
        opacity = opacity * conf
    elif mode == "test":
        assert conf_per_gaussian is not None
        opacity = opacity * conf_per_gaussian.reshape(-1, 1)
    elif mode == "no_soft":
        pass
    elif mode == "confidence":
        conf = (per_gaussian_conf(params, meta)
                if conf_per_gaussian is None else conf_per_gaussian)
        opacity = jnp.ones_like(opacity)
        colors_precomp = jnp.broadcast_to(conf.reshape(-1, 1),
                                          (conf.size, 3)).astype(jnp.float32)
        shs = None
    else:
        raise ValueError(mode)

    opacity = opacity * alive_f

    view, proj, campos, tfx, tfy = _raster_common(fovx, fovy)

    offset = mean2d_offset
    if offset is None and capture_mean2d_grad:
        offset = jnp.zeros_like(params.xyz[:, :2])
    img, radii, aux = rasterize(
        xyz_cam, opacity, settings,
        viewmatrix=view, projmatrix=proj, campos=campos, bg=bg,
        tan_fovx=tfx, tan_fovy=tfy,
        shs=shs, colors_precomp=colors_precomp,
        scales=activated_scaling(params), rotations=rot_cam,
        mean2d_offset=offset, tile_axis=tile_axis, gauss_axis=gauss_axis,
        mesh=mesh, backend=backend)
    return RenderOutput(image=img, radii=radii,
                        mean2d_grad_capture=offset, aux=aux)
