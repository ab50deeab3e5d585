"""Multi-chip training step: data-parallel over a frame batch × tile-parallel
inside each render, on a (data, tile) mesh.

This is a capability the reference does not have — its 3DGS stage is
strictly single-GPU (SURVEY.md §2.8). Semantics: one sharded step optimizes
the MEAN loss over a batch of B frames (B = mesh data-axis size), the
large-batch generalization of the reference's one-frame-per-iteration loop;
the camera Adam gate applies per step on the mean PSNR.

All communication is XLA-inserted over ICI: gradient all-reduce along
``data`` (the DDP equivalent) and the per-Gaussian gradient reduction along
``tile`` at the transpose of the per-tile attribute gathers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from das3r_tpu.models import render as render_mod
from das3r_tpu.models.gaussians import GaussianMeta, PoseParams
from das3r_tpu.ops.splat import RasterSettings
from das3r_tpu.train import loss as loss_mod
from das3r_tpu.train import optim, step as step_mod
from das3r_tpu.train.config import OptimizationConfig


def batch_sharding(mesh: Mesh):
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def _gauss_params_spec(mesh: Mesh, axis: str):
    """GaussianParams sharding: every per-Gaussian [Nc, ...] leaf split on
    the primitive axis; the per-pixel conf field replicated."""
    g = NamedSharding(mesh, P(axis))
    r = replicated(mesh)
    from das3r_tpu.models.gaussians import GaussianParams
    return GaussianParams(xyz=g, features_dc=g, features_rest=g,
                          scaling=g, rotation=g, opacity=g, conf_static=r)


def gauss_state_spec(mesh: Mesh, axis: str = "gauss"):
    """Sharding prefix-tree for TrainState with Gaussian params + their Adam
    moments split along mesh axis ``axis`` (SURVEY.md §2.8 / BASELINE
    config[4]: the param+optimizer memory — ~3x the param size — is what
    bounds single-chip Gaussian capacity, so it is what gets sharded)."""
    pspec = _gauss_params_spec(mesh, axis)
    r = replicated(mesh)
    opt = optim.AdamState(count=r, mu=pspec, nu=pspec)
    return step_mod.TrainState(params=pspec, poses=r, opt=opt,
                               opt_cam=r, step=r)


def gauss_meta_spec(mesh: Mesh, axis: str = "gauss"):
    g = NamedSharding(mesh, P(axis))
    return GaussianMeta(alive=g, pix_id=g, max_radii2d=g,
                        xyz_grad_accum=g, denom=g)


def make_sharded_train_step(mesh: Mesh, settings: RasterSettings,
                            cfg: OptimizationConfig,
                            spatial_lr_scale: float = 1.0,
                            gauss_axis: str | None = None,
                            backend: str = "auto"):
    """Returns a jitted step(state, meta, uids[B], gts[B,3,H,W], fovx[B],
    fovy[B], bg) -> (state, metrics) with inputs sharded over ``data``,
    each frame's tiles sharded over ``tile``, and — when ``gauss_axis`` is
    given — Gaussian params/Adam state/preprocess sharded over that axis
    (capacity must be divisible by the axis size; ``init_from_frames``
    rounds capacity to 4096).

    ``backend``: 'pallas' runs each render's blend through the shard_map'd
    entry-stream kernels (tile ranges split per device; interpret mode
    off-TPU); 'auto' picks Pallas on TPU, XLA elsewhere."""

    def per_frame_loss(params, poses, meta, uid, gt, fx, fy, bg):
        pose = poses.pose(uid)
        out = render_mod.render(params, meta, settings, pose, bg, fx, fy,
                                mode="train", tile_axis="tile",
                                gauss_axis=gauss_axis, mesh=mesh,
                                backend=backend)
        static = params.conf_static[uid]
        # Replicate the assembled image before the loss: the SSIM window
        # stencil would otherwise be spatially partitioned, and its halo
        # reassociation makes gradients differ between mesh shapes — with a
        # replicated image the loss math is partition-invariant, so the
        # sharded step stays BIT-identical to the unsharded one (the
        # image is ~0.5 MB; its cotangent re-shards at the constraint).
        img = jax.lax.with_sharding_constraint(
            out.image, jax.sharding.NamedSharding(mesh, P()))
        ph = loss_mod.photometric_loss(img, gt, static,
                                       cfg.lambda_dssim)
        return (ph.loss, ph.psnr_frame, out.aux.entry_overflow,
                out.aux.tile_overflow, out.aux.dup_overflow,
                out.aux.heavy_overflow, out.aux.heavy_rows)

    state_spec = (gauss_state_spec(mesh, gauss_axis) if gauss_axis
                  else replicated(mesh))
    meta_spec = (gauss_meta_spec(mesh, gauss_axis) if gauss_axis
                 else replicated(mesh))

    @functools.partial(
        jax.jit,
        in_shardings=(state_spec, meta_spec,
                      batch_sharding(mesh), batch_sharding(mesh),
                      batch_sharding(mesh), batch_sharding(mesh),
                      replicated(mesh)),
        out_shardings=(state_spec, replicated(mesh)))
    def step(state: step_mod.TrainState, meta: GaussianMeta, uids, gts,
             fovx, fovy, bg):
        gstep = state.step + 1

        def loss_fn(params, poses):
            losses, psnrs, eovf, tovf, dovf, hovf, hrows = jax.vmap(
                per_frame_loss, in_axes=(None, None, None, 0, 0, 0, 0, None)
            )(params, poses, meta, uids, gts, fovx, fovy, bg)
            return losses.mean(), (psnrs.mean(), eovf.max(), tovf.max(),
                                   dovf.max(), hovf.max(), hrows.max())

        (lossv, (psnr_mean, overflow, tile_ovf, dup_ovf, heavy_ovf,
                 heavy_rows)), \
            (g_params, g_poses) = \
            jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, state.poses)

        new_params, new_opt = optim.adam_step(
            state.params, g_params, state.opt,
            optim.gaussian_lrs(gstep, cfg, spatial_lr_scale))
        gate = psnr_mean > cfg.psnr_threshold
        new_poses, new_opt_cam = optim.adam_step(
            state.poses, g_poses, state.opt_cam,
            optim.camera_lrs(gstep, cfg), gate=gate)

        new_state = step_mod.TrainState(
            params=new_params, poses=new_poses, opt=new_opt,
            opt_cam=new_opt_cam, step=gstep)
        metrics = step_mod.StepMetrics(
            loss=lossv, psnr=psnr_mean, cam_stepped=gate,
            radii_nonzero=jnp.zeros((), jnp.int32),
            entry_overflow=overflow, tile_overflow=tile_ovf,
            dup_overflow=dup_ovf, heavy_overflow=heavy_ovf,
            heavy_rows=heavy_rows)
        return new_state, metrics

    return step


def make_sharded_render(mesh: Mesh, settings: RasterSettings,
                        backend: str = "auto"):
    """Single-frame render with tiles sharded over the mesh's tile axis."""

    @functools.partial(jax.jit, out_shardings=replicated(mesh))
    def render_fn(params, meta, pose, bg, fovx, fovy):
        out = render_mod.render(params, meta, settings, pose, bg, fovx,
                                fovy, mode="train", tile_axis="tile",
                                mesh=mesh, backend=backend)
        return out.image

    return render_fn
