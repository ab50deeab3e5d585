"""Per-Gaussian preprocessing: cull, project, EWA conic, radius, SH color.

Reproduces the math of the CUDA rasterizer's ``preprocessCUDA`` stage
(reference spec: SURVEY.md §2.9; call-site contract in
gaussian_renderer/__init__.py:62-140), vectorized over all N Gaussians as one
fused XLA computation — this stage is pure elementwise/VPU work plus tiny
matmuls, which XLA fuses into a handful of kernels on TPU.

Matrix convention: ``viewmatrix`` / ``projmatrix`` are ROW-VECTOR form
(``p' = [x y z 1] @ M``), exactly what the reference passes to CUDA
(identity view + transposed GL projection, gaussian_renderer/__init__.py:56-78).

Everything is differentiable; culling is expressed through a validity mask so
shapes stay static under jit.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from das3r_tpu.ops.splat.settings import RasterSettings
from das3r_tpu.utils import sh as sh_lib


class Preprocessed(NamedTuple):
    """Per-Gaussian screen-space quantities (all [N, ...])."""
    mean2d: jax.Array      # [N, 2] pixel coords of projected center
    depth: jax.Array       # [N]   view-space z
    conic: jax.Array       # [N, 3] inverse 2D covariance (xx, xy, yy)
    color: jax.Array       # [N, 3] RGB after SH eval (or passthrough)
    opacity: jax.Array     # [N]
    radius: jax.Array      # [N]   int32 screen radius; 0 == culled
    rect_min: jax.Array    # [N, 2] int32 inclusive tile rect (x, y)
    rect_max: jax.Array    # [N, 2] int32 exclusive tile rect
    n_tiles_touched: jax.Array  # [N] int32
    binnable: jax.Array    # [N] bool: radius > 0 AND opacity can ever pass
                           # the 1/255 alpha floor (alpha = op*exp(power) <=
                           # op, so op < floor never blends — skipping such
                           # Gaussians at binning is exactly image-preserving
                           # and lets capacity-padded dead Gaussians cost 0)
    q_cap: jax.Array       # [N] conic-quadratic level where alpha crosses
                           # the floor: q_cap = 2 ln(op / alpha_floor)
                           # (UNcapped; binning's per-tile cull keeps a pair
                           # iff min_box q <= q_cap — see settings
                           # ``tight_binning``)


def build_cov3d(scales: jax.Array, rotations: jax.Array,
                scale_modifier: float) -> jax.Array:
    """Scales [N,3] (activated, i.e. post-exp) + quats [N,4] -> [N, 6] upper
    triangular 3D covariance (xx, xy, xz, yy, yz, zz).

    Sigma = R S^2 R^T — same as the CUDA ``computeCov3D`` / python mirror
    utils/general_utils.py:101-110. Hand-expanded over [N] scalar columns
    (structure-of-arrays): the [N,3,3] einsum formulation materializes
    tile-padded intermediates and measures ~3x slower on TPU (docs/PERF.md).
    """
    q = rotations / jnp.linalg.norm(rotations, axis=-1,
                                    keepdims=True).clip(1e-12)
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R00 = 1 - 2 * (y * y + z * z)
    R01 = 2 * (x * y - r * z)
    R02 = 2 * (x * z + r * y)
    R10 = 2 * (x * y + r * z)
    R11 = 1 - 2 * (x * x + z * z)
    R12 = 2 * (y * z - r * x)
    R20 = 2 * (x * z - r * y)
    R21 = 2 * (y * z + r * x)
    R22 = 1 - 2 * (x * x + y * y)
    sc = scales * scale_modifier
    s0, s1, s2 = sc[:, 0], sc[:, 1], sc[:, 2]
    L00, L01, L02 = R00 * s0, R01 * s1, R02 * s2
    L10, L11, L12 = R10 * s0, R11 * s1, R12 * s2
    L20, L21, L22 = R20 * s0, R21 * s1, R22 * s2
    return jnp.stack([
        L00 * L00 + L01 * L01 + L02 * L02,
        L00 * L10 + L01 * L11 + L02 * L12,
        L00 * L20 + L01 * L21 + L02 * L22,
        L10 * L10 + L11 * L11 + L12 * L12,
        L10 * L20 + L11 * L21 + L12 * L22,
        L20 * L20 + L21 * L21 + L22 * L22,
    ], -1)


def _cov2d(mean_view: jax.Array, cov3d: jax.Array, viewmatrix: jax.Array,
           focal_x: float, focal_y: float, tan_fovx: float,
           tan_fovy: float) -> jax.Array:
    """EWA projection of the 3D covariance to screen space ([N, 3] = xx,xy,yy).

    Matches CUDA ``computeCov2D`` including the 1.3*tan_fov frustum clamp on
    the Jacobian evaluation point and the +0.3 screen-space dilation.
    """
    tx, ty, tz = mean_view[:, 0], mean_view[:, 1], mean_view[:, 2]
    limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
    txtz = jnp.clip(tx / tz, -limx, limx) * tz
    tytz = jnp.clip(ty / tz, -limy, limy) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # Hand-expanded J @ W and T Sigma T^T over [N] scalar columns (SoA) —
    # the [N,2,3]/[N,3,3] einsum formulation materializes tile-padded
    # intermediates and measures ~3x slower on TPU (docs/PERF.md).
    # J rows: (fx/z, 0, -fx*txtz/z^2), (0, fy/z, -fy*tytz/z^2).
    j00 = focal_x * inv_z
    j02 = -focal_x * txtz * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * tytz * inv_z2
    # W: world->view rotation. Row-vector convention means viewmatrix[:3,:3]
    # is R^T of the math convention, so the math rotation is its transpose.
    Wr = viewmatrix[:3, :3].T                           # [3, 3] (traced)
    T00 = j00 * Wr[0, 0] + j02 * Wr[2, 0]
    T01 = j00 * Wr[0, 1] + j02 * Wr[2, 1]
    T02 = j00 * Wr[0, 2] + j02 * Wr[2, 2]
    T10 = j11 * Wr[1, 0] + j12 * Wr[2, 0]
    T11 = j11 * Wr[1, 1] + j12 * Wr[2, 1]
    T12 = j11 * Wr[1, 2] + j12 * Wr[2, 2]

    c0, c1, c2 = cov3d[:, 0], cov3d[:, 1], cov3d[:, 2]
    c3, c4, c5 = cov3d[:, 3], cov3d[:, 4], cov3d[:, 5]
    # rows of T @ Sigma (Sigma symmetric)
    s00 = T00 * c0 + T01 * c1 + T02 * c2
    s01 = T00 * c1 + T01 * c3 + T02 * c4
    s02 = T00 * c2 + T01 * c4 + T02 * c5
    s10 = T10 * c0 + T11 * c1 + T12 * c2
    s11 = T10 * c1 + T11 * c3 + T12 * c4
    s12 = T10 * c2 + T11 * c4 + T12 * c5
    xx = s00 * T00 + s01 * T01 + s02 * T02 + 0.3
    xy = s00 * T10 + s01 * T11 + s02 * T12
    yy = s10 * T10 + s11 * T11 + s12 * T12 + 0.3
    return jnp.stack([xx, xy, yy], -1)


def preprocess(
    means3d: jax.Array,
    opacities: jax.Array,
    settings: RasterSettings,
    *,
    viewmatrix: jax.Array,
    projmatrix: jax.Array,
    campos: jax.Array,
    shs: jax.Array | None = None,
    colors_precomp: jax.Array | None = None,
    scales: jax.Array | None = None,
    rotations: jax.Array | None = None,
    cov3d_precomp: jax.Array | None = None,
    mean2d_offset: jax.Array | None = None,
    tan_fovx,
    tan_fovy,
) -> Preprocessed:
    """Project N Gaussians to screen space.

    ``mean2d_offset`` is a zeros [N, 2] tensor added to the projected pixel
    center; its cotangent reproduces the reference's ``screenspace_points``
    gradient-capture contract (gaussian_renderer/__init__.py:41-50) used for
    densification statistics.
    """
    s = settings
    n = means3d.shape[0]
    f32 = means3d.dtype

    focal_x = s.image_width / (2.0 * tan_fovx)
    focal_y = s.image_height / (2.0 * tan_fovy)

    ones = jnp.ones((n, 1), f32)
    homo = jnp.concatenate([means3d, ones], -1)          # [N, 4]
    p_view = jnp.matmul(homo, viewmatrix, precision="highest")                           # [N, 4] row-vector
    p_hom = jnp.matmul(homo, projmatrix, precision="highest")                            # [N, 4]
    depth = p_view[:, 2]

    in_front = depth > s.near                            # cull z <= 0.001

    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]
    # ndc2Pix(v, S) = ((v + 1) * S - 1) / 2
    mean2d = jnp.stack([
        ((p_proj[:, 0] + 1) * s.image_width - 1) * 0.5,
        ((p_proj[:, 1] + 1) * s.image_height - 1) * 0.5,
    ], -1)
    if mean2d_offset is not None:
        mean2d = mean2d + mean2d_offset

    if cov3d_precomp is not None:
        cov3d = cov3d_precomp
    else:
        assert scales is not None and rotations is not None
        cov3d = build_cov3d(scales, rotations, s.scale_modifier)

    safe_view = jnp.where(jnp.broadcast_to(in_front[:, None], (n, 3)),
                          p_view[:, :3], jnp.ones((n, 3), f32))
    cov2d = _cov2d(safe_view, cov3d, viewmatrix,
                   focal_x, focal_y, tan_fovx, tan_fovy)

    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] ** 2
    det_ok = det != 0.0
    safe_det = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / safe_det
    conic = jnp.stack([cov2d[:, 2] * inv_det, -cov2d[:, 1] * inv_det,
                       cov2d[:, 0] * inv_det], -1)

    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lam1 = mid + disc
    lam2 = mid - disc
    lam_max = jnp.maximum(lam1, lam2)
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lam_max))

    # alpha-floor crossing of the conic quadratic: alpha = op e^{-q/2} >=
    # floor iff q <= q_cap. q >= dist^2 / lam_max, so pixels farther than
    # sqrt(q_cap * lam_max) can never reach the floor — an EXACT shrink of
    # the 3-sigma rect (the reference's per-pixel ``alpha < 1/255`` skip
    # fires at every pixel of the excluded tiles). Capped at 3 sigma so the
    # rect never grows past the reference's (pixels outside the 3-sigma
    # rect are dropped by the reference even when alpha >= floor).
    op_sg = jax.lax.stop_gradient(opacities.reshape(n))
    q_cap = 2.0 * jnp.log(jnp.maximum(op_sg / s.alpha_floor, 1e-12))

    # tile rect (getRect): int truncation after clamping to the grid.
    # The REFERENCE rect (3-sigma radius, the CUDA formula verbatim —
    # including its quirk of dropping the last tile when mu + r lands
    # within 1px past a tile boundary, which we must reproduce).
    tgrid = jnp.asarray([s.tiles_x, s.tiles_y], jnp.int32)
    mean2d_sg = jax.lax.stop_gradient(mean2d)
    rect_min = jnp.clip(
        jnp.floor((mean2d_sg - radius_f[:, None]) / s.tile
                  ).astype(jnp.int32),
        0, tgrid)
    rect_max = jnp.clip(
        ((mean2d_sg + radius_f[:, None] + s.tile - 1)
         // s.tile).astype(jnp.int32),
        0, tgrid)
    s3 = jnp.maximum(rect_max - rect_min, 0)
    span3 = s3[:, 0] * s3[:, 1]

    if s.tight_binning:
        # Intersect with the alpha-floor support box — computed with a
        # PROPER floor/ceil (the reference's (x + T - 1) // T idiom is only
        # ceil for integers; with a shrunk radius it would drop covered
        # tiles). Intersection keeps the rect exactly <= the reference's.
        r_t = jnp.sqrt(jnp.maximum(q_cap, 0.0) * lam_max)[:, None]
        tmin = jnp.floor((mean2d_sg - r_t) / s.tile).astype(jnp.int32)
        tmax = jnp.floor((mean2d_sg + r_t) / s.tile).astype(jnp.int32) + 1
        rect_min = jnp.clip(jnp.maximum(rect_min, tmin), 0, tgrid)
        rect_max = jnp.clip(jnp.minimum(rect_max, tmax), 0, tgrid)
    span = jnp.maximum(rect_max - rect_min, 0)
    n_tiles_touched = span[:, 0] * span[:, 1]

    # validity/radius stay 3-sigma-based for reference parity (densify
    # stats and the visibility filter read ``radius``).
    valid = in_front & det_ok & (span3 > 0)
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    n_tiles_touched = jnp.where(valid, n_tiles_touched, 0)
    binnable = valid & (op_sg >= s.alpha_floor) & (n_tiles_touched > 0)

    if colors_precomp is not None:
        color = colors_precomp
    else:
        assert shs is not None
        direction = means3d - campos[None, :]
        # Double-where safe normalize: dead capacity slots sit at the origin
        # and the first (rearranged) camera is at the origin too, so the
        # plain norm has a NaN gradient there that poisons the POSE grad
        # (summed over all Gaussians) the moment sh_degree reaches 1.
        sq = jnp.sum(direction * direction, axis=-1, keepdims=True)
        safe = jnp.where(sq > 0.0, sq, 1.0)
        direction = jnp.where(sq > 0.0, direction / jnp.sqrt(safe), 0.0)
        # shs: [N, K, 3] -> eval wants [N, 3, K]
        raw = sh_lib.eval_sh(s.sh_degree, jnp.swapaxes(shs, -1, -2), direction)
        color = jnp.maximum(raw + 0.5, 0.0)

    return Preprocessed(
        mean2d=mean2d,
        depth=depth,
        conic=conic,
        color=color,
        opacity=opacities.reshape(n),
        radius=radius,
        rect_min=rect_min,
        rect_max=rect_max,
        n_tiles_touched=n_tiles_touched,
        binnable=binnable,
        q_cap=q_cap,
    )
