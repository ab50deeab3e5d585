"""Jit-compiled training steps for stage-2 Gaussian-splat optimization.

One XLA computation per step covers the reference's per-iteration work
(train_gui.py:530-641 / SURVEY.md §3.2): render with the frame's learnable
pose -> conf-weighted L1+SSIM -> grads -> main Adam step (always) + camera
Adam step gated on frame PSNR (lax.cond-free: arithmetic gating inside
``adam_step``). The SH-degree schedule is static per compile (bumped every
3000 iters by the host loop, recompiling at most ``max_sh_degree`` times).

A second step (``test_pose_step``) implements the test-time pose-only
optimization protocol of train_test_psnr.py:109-149.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from das3r_tpu.models import render as render_mod
from das3r_tpu.models.gaussians import (
    GaussianMeta, GaussianParams, PoseParams, TestPoseParams)
from das3r_tpu.ops.splat import RasterSettings
from das3r_tpu.train import loss as loss_mod
from das3r_tpu.train import optim
from das3r_tpu.train.config import OptimizationConfig


class TrainState(NamedTuple):
    params: GaussianParams
    poses: PoseParams
    opt: optim.AdamState       # main group
    opt_cam: optim.AdamState   # camera group
    step: jax.Array            # [] int32, 1-based after first call


class TestPoseState(NamedTuple):
    poses: TestPoseParams
    opt: optim.AdamState


class StepMetrics(NamedTuple):
    loss: jax.Array
    psnr: jax.Array
    cam_stepped: jax.Array
    radii_nonzero: jax.Array
    # entries dropped by the static stream/compaction capacity this step
    # (RasterAux.entry_overflow) — the trainer watches this to auto-regrow
    # ``max_total_entries``, the TPU analog of the CUDA rasterizer's
    # resizeFunctional buffer growth (VERDICT r2 missing #5)
    entry_overflow: jax.Array
    # entries truncated by the [T, K] window path's per-tile capacity
    # (RasterAux.tile_overflow; always 0 on the exact entry-stream path)
    # and (Gaussian, tile) pairs dropped by the duplication cap
    # ``max_tiles_per_gaussian`` (RasterAux.dup_overflow) — logged at
    # report points so capacity starvation is never silent
    tile_overflow: jax.Array
    dup_overflow: jax.Array
    # entries dropped by the split dup table's heavy-rows cap
    # (RasterAux.heavy_overflow) plus the live heavy-row count
    # (RasterAux.heavy_rows) — the trainer regrows
    # ``heavy_rows_cap`` from these
    heavy_overflow: jax.Array
    heavy_rows: jax.Array


def init_train_state(params: GaussianParams,
                     poses: PoseParams) -> TrainState:
    return TrainState(params=params, poses=poses,
                      opt=optim.adam_init(params),
                      opt_cam=optim.adam_init(poses),
                      step=jnp.zeros((), jnp.int32))


@functools.partial(
    jax.jit,
    static_argnames=("settings", "cfg", "spatial_lr_scale", "optim_pose",
                     "track_stats"),
    donate_argnames=("state",))
def train_step(
    state: TrainState,
    meta: GaussianMeta,
    uid: jax.Array,            # [] int32 frame index
    gt_image: jax.Array,       # [3, H, W]
    fovx: jax.Array,           # [] per-frame FoV (from stage-1 intrinsics)
    fovy: jax.Array,
    bg: jax.Array,             # [3]
    settings: RasterSettings,
    cfg: OptimizationConfig,
    spatial_lr_scale: float = 1.0,
    optim_pose: bool = True,
    track_stats: bool = False,
):
    """One training iteration. Returns (new_state, new_meta, StepMetrics).

    With ``track_stats`` the screen-space positional gradient (the
    reference's ``screenspace_points.grad``, train_gui.py:604-608) is
    captured through an explicit zeros offset input and accumulated into
    ``meta`` (add_densification_stats); otherwise meta passes through
    unchanged and XLA removes the dead offset plumbing.
    """
    step = state.step + 1
    offset0 = jnp.zeros_like(state.params.xyz[:, :2])

    def loss_fn(params: GaussianParams, poses: PoseParams, offset):
        pose = poses.pose(uid)
        out = render_mod.render(params, meta, settings, pose, bg, fovx, fovy,
                                mode="train",
                                mean2d_offset=offset if track_stats else None)
        static = params.conf_static[uid]
        ph = loss_mod.photometric_loss(out.image, gt_image, static,
                                       cfg.lambda_dssim)
        return ph.loss, (ph.psnr_frame, out.radii,
                         out.aux.entry_overflow, out.aux.tile_overflow,
                         out.aux.dup_overflow, out.aux.heavy_overflow,
                         out.aux.heavy_rows)

    (lossv, (psnr_frame, radii, entry_overflow, tile_overflow,
             dup_overflow, heavy_overflow, heavy_rows)), \
        (g_params, g_poses, g_offset) = \
        jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)(
            state.params, state.poses, offset0)

    if track_stats:
        from das3r_tpu.models import densify as densify_mod
        new_meta = densify_mod.add_densification_stats(meta, g_offset, radii)
    else:
        new_meta = meta

    new_params, new_opt = optim.adam_step(
        state.params, g_params, state.opt,
        optim.gaussian_lrs(step, cfg, spatial_lr_scale))

    gate = (psnr_frame > cfg.psnr_threshold) if optim_pose else jnp.asarray(
        False)
    new_poses, new_opt_cam = optim.adam_step(
        state.poses, g_poses, state.opt_cam,
        optim.camera_lrs(step, cfg), gate=gate)

    new_state = TrainState(params=new_params, poses=new_poses, opt=new_opt,
                           opt_cam=new_opt_cam, step=step)
    metrics = StepMetrics(loss=lossv, psnr=psnr_frame,
                          cam_stepped=gate,
                          radii_nonzero=jnp.sum((radii > 0).astype(jnp.int32)),
                          entry_overflow=entry_overflow,
                          tile_overflow=tile_overflow,
                          dup_overflow=dup_overflow,
                          heavy_overflow=heavy_overflow,
                          heavy_rows=heavy_rows)
    return new_state, new_meta, metrics


@functools.partial(
    jax.jit,
    static_argnames=("settings", "cfg", "spatial_lr_scale", "optim_pose",
                     "track_stats"),
    donate_argnames=("state",))
def train_chunk(
    state: TrainState,
    meta: GaussianMeta,
    uids: jax.Array,           # [C] int32 frame schedule for this chunk
    gt_images: jax.Array,      # [F, 3, H, W] full stack (device-resident)
    fovx: jax.Array,           # [F]
    fovy: jax.Array,
    bg: jax.Array,
    settings: RasterSettings,
    cfg: OptimizationConfig,
    spatial_lr_scale: float = 1.0,
    optim_pose: bool = True,
    track_stats: bool = False,
):
    """Run len(uids) training iterations in ONE XLA computation via
    lax.scan — the TPU-native loop shape: a single dispatch per chunk, no
    per-iteration host round trips (which cost tens of ms on a local host
    and seconds over remote transports). Returns (state, meta, StepMetrics
    with leading chunk axis); meta carries densification statistics when
    ``track_stats``."""

    def body(carry, uid):
        state, meta = carry
        new_state, new_meta, metrics = train_step(
            state, meta, uid, gt_images[uid], fovx[uid], fovy[uid], bg,
            settings, cfg, spatial_lr_scale=spatial_lr_scale,
            optim_pose=optim_pose, track_stats=track_stats)
        return (new_state, new_meta), metrics

    (state, meta), metrics = jax.lax.scan(body, (state, meta), uids)
    return state, meta, metrics


@functools.partial(jax.jit, static_argnames=("settings", "cfg"))
def test_pose_step(
    tp_state: TestPoseState,
    params: GaussianParams,
    meta: GaussianMeta,
    uid: jax.Array,
    gt_image: jax.Array,
    gt_dynamic_mask: jax.Array,   # [3, H, W] or [1, H, W]
    fovx: jax.Array,
    fovy: jax.Array,
    bg: jax.Array,
    step: jax.Array,              # global iteration (drives the cam lr)
    settings: RasterSettings,
    cfg: OptimizationConfig,
):
    """Test-time pose alignment: optimize ONLY the held-out frame's pose
    against the GT-static-masked photometric loss; the Gaussian parameters
    are frozen (train_test_psnr.py:109-149).

    NOTE: the reference *intends* this but its step is a silent no-op — it
    calls ``optimizer_cam.step()`` (train Q/T, whose grads are None in the
    test pass) while ``optimizer_cam_test`` is created and never stepped
    (train_test_psnr.py:144-149, gaussian_model.py:263-268). The published
    PSNR numbers therefore use UNOPTIMIZED stage-1 test poses. We implement
    the working version; pass ``--no-optim-test-pose`` in the harness for
    strict protocol parity with the reference."""

    def loss_fn(poses: TestPoseParams):
        pose = poses.pose(uid)
        out = render_mod.render(params, meta, settings, pose, bg, fovx, fovy,
                                mode="train")
        m = 1.0 - gt_dynamic_mask
        p = out.image * m
        g = gt_image * m
        l1 = jnp.abs(p - g)
        from das3r_tpu.utils import image as image_utils
        ssim_map = image_utils.ssim(p, g, size_average=False)
        loss = ((1.0 - cfg.lambda_dssim) * l1
                + cfg.lambda_dssim * (1.0 - ssim_map)).mean()
        return loss, image_utils.psnr(p[None], g[None]).mean()

    (lossv, psnr_v), g_poses = jax.value_and_grad(
        loss_fn, has_aux=True)(tp_state.poses)
    new_poses, new_opt = optim.adam_step(
        tp_state.poses, g_poses, tp_state.opt,
        optim.test_camera_lrs(step, cfg))
    return TestPoseState(poses=new_poses, opt=new_opt), lossv, psnr_v


@functools.partial(jax.jit, static_argnames=("settings", "cfg"),
                   donate_argnames=("tp_state",))
def test_pose_chunk(
    tp_state: TestPoseState,
    params: GaussianParams,
    meta: GaussianMeta,
    uids: jax.Array,              # [C] int32 test-frame schedule
    gt_images: jax.Array,         # [Ft, 3, H, W]
    gt_dynamic_masks: jax.Array,  # [Ft, 3, H, W]
    fovx: jax.Array,              # [Ft]
    fovy: jax.Array,
    bg: jax.Array,
    step: jax.Array,
    settings: RasterSettings,
    cfg: OptimizationConfig,
):
    """One pass of test-pose-only optimization over ``uids`` as a single
    lax.scan dispatch (the per-frame host loop costs ~10 ms/dispatch through
    remote transports)."""

    def body(tp, uid):
        new_tp, lossv, psnr_v = test_pose_step(
            tp, params, meta, uid, gt_images[uid], gt_dynamic_masks[uid],
            fovx[uid], fovy[uid], bg, step, settings, cfg)
        return new_tp, (lossv, psnr_v)

    return jax.lax.scan(body, tp_state, uids)
