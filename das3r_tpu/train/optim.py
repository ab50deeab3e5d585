"""Gated, externally-scheduled Adam groups (pure jnp).

The reference drives three ``torch.optim.Adam(eps=1e-15)`` instances whose
learning rates are rewritten from the *global* iteration each step
(gaussian_model.py:259-324) and whose camera group only steps when the frame
PSNR clears a threshold (train_gui.py:581-586). Neither pattern maps onto a
stock optax chain cleanly (optax counts its own steps), so this module
implements torch-exact Adam as pure functions:

  * bias-correction count increments only on *taken* steps (gating);
  * per-leaf learning rates are passed in each call, computed from the global
    step by ``*_lrs`` helpers mirroring update_learning_rate.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from das3r_tpu.models.gaussians import GaussianParams, PoseParams, TestPoseParams
from das3r_tpu.train.config import OptimizationConfig
from das3r_tpu.utils import schedules


class AdamState(NamedTuple):
    count: jax.Array  # [] int32 — number of steps actually taken
    mu: object        # pytree like params
    nu: object        # pytree like params


def adam_init(params) -> AdamState:
    z = jax.tree.map(jnp.zeros_like, params)
    return AdamState(count=jnp.zeros((), jnp.int32), mu=z,
                     nu=jax.tree.map(jnp.zeros_like, params))


def adam_step(params, grads, state: AdamState, lrs, *, gate=None,
              b1: float = 0.9, b2: float = 0.999, eps: float = 1e-15):
    """One (possibly gated) Adam step.

    Args:
      lrs: pytree of per-leaf scalar learning rates (same structure as
        params), typically produced by ``gaussian_lrs``/``camera_lrs``.
      gate: optional [] bool; when False the step is a no-op (params AND
        optimizer state unchanged — matching a skipped ``optimizer.step()``).

    Returns (new_params, new_state).
    """
    g = jnp.asarray(1.0) if gate is None else gate.astype(jnp.float32)
    count = state.count + (jnp.asarray(1, jnp.int32) if gate is None
                           else gate.astype(jnp.int32))
    # bias correction from the post-step count; clamp to >=1 so a gated-off
    # first step (count still 0) doesn't divide by zero — the whole update is
    # multiplied by the gate anyway.
    c = jnp.maximum(count.astype(jnp.float32), 1.0)
    bc1 = 1.0 - b1 ** c
    bc2 = 1.0 - b2 ** c

    new_mu = jax.tree.map(
        lambda mu, gr: mu + g * ((b1 * mu + (1 - b1) * gr) - mu),
        state.mu, grads)
    new_nu = jax.tree.map(
        lambda nu, gr: nu + g * ((b2 * nu + (1 - b2) * gr * gr) - nu),
        state.nu, grads)
    new_p = jax.tree.map(
        lambda p, mu, nu, lr: p - g * (
            lr * (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)),
        params, new_mu, new_nu, lrs)
    return new_p, AdamState(count=count, mu=new_mu, nu=new_nu)


def gaussian_lrs(step, cfg: OptimizationConfig,
                 spatial_lr_scale: float) -> GaussianParams:
    """Per-leaf lrs for the main group at global (1-based) ``step``
    (training_setup + update_learning_rate, gaussian_model.py:228-324)."""
    xyz_lr = schedules.expon_lr(
        step, cfg.position_lr_init * spatial_lr_scale,
        cfg.position_lr_final * spatial_lr_scale,
        lr_delay_mult=cfg.position_lr_delay_mult,
        max_steps=cfg.position_lr_max_steps)
    conf_lr = schedules.expon_lr(
        step, cfg.conf_lr_init, cfg.conf_lr_final,
        lr_delay_mult=cfg.position_lr_delay_mult,
        max_steps=cfg.iterations)
    f = jnp.float32
    # Opt-in ablation: zero the attr lrs. NOT reference parity — the
    # reference's requires_grad_(False) at gaussian_model.py:651-659 is
    # undone by nn.Parameter (constructor default requires_grad=True),
    # so it trains every attribute on the create_from_cameras path.
    attr = 0.0 if cfg.freeze_attrs else 1.0
    return GaussianParams(
        xyz=xyz_lr.astype(f),
        features_dc=jnp.asarray(attr * cfg.feature_lr, f),
        features_rest=jnp.asarray(attr * cfg.feature_lr / 20.0, f),
        scaling=jnp.asarray(attr * cfg.scaling_lr, f),
        rotation=jnp.asarray(attr * cfg.rotation_lr, f),
        opacity=jnp.asarray(attr * cfg.opacity_lr, f),
        conf_static=conf_lr.astype(f),
    )


def camera_lrs(step, cfg: OptimizationConfig) -> PoseParams:
    cam_lr = schedules.expon_lr(
        step, cfg.cam_lr_init, cfg.cam_lr_final,
        lr_delay_mult=cfg.position_lr_delay_mult,
        max_steps=cfg.cam_lr_max_steps)
    f = jnp.float32
    return PoseParams(Q=cam_lr.astype(f), T=cam_lr.astype(f),
                      fovx=jnp.asarray(cfg.fov_lr, f),
                      fovy=jnp.asarray(cfg.fov_lr, f))


def test_camera_lrs(step, cfg: OptimizationConfig) -> TestPoseParams:
    cam_lr = schedules.expon_lr(
        step, cfg.cam_lr_init, cfg.cam_lr_final,
        lr_delay_mult=cfg.position_lr_delay_mult,
        max_steps=cfg.cam_lr_max_steps)
    f = jnp.float32
    return TestPoseParams(Q=cam_lr.astype(f), T=cam_lr.astype(f))
